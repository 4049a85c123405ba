"""Cap-parity gate for the truncating per-key path builders (r7
VERDICT #1): above MAX_EVENTS_PER_KEY the _cap_per_key builders keep
only the first N events per key (by the (ts, event_id) total order) —
declared semantics, not a bug. Their DuckDB oracles now carry the
matching QUALIFY rn <= cap, so the correctness gate must agree with
the engine even ABOVE the cap.

This test proves it with a synthetic mega-user corpus that actually
crosses the cap (10,500 events for one user, purchase-after-cap), and
proves the test has POWER: the UNCAPPED oracle gives a different
answer on the same data, so agreement is not vacuous.

The cap is exercised at its real production value (10,000) — the
corpus is ~10.5k rows, trivial for both engines.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from se_data_pipeline_spark.queries import _REGISTRY, all_queries
from se_data_pipeline_spark.queries.events import MAX_EVENTS_PER_KEY

CAPPED_QUERIES = [
    "event_funnel",
    "event_funnel_time_bound",
    "top_session_paths",
    "user_path_patterns",
    "attribution_markov_removal",
]


def _canon(pdf: pd.DataFrame):
    """Driver-style canonical form (column-name sorted, rows sorted,
    floats rounded) — same normalization as tools/check_correctness."""

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, (np.floating, float)):
            f = float(v)
            return "NULL" if math.isnan(f) else repr(round(f, 9) + 0.0)
        if isinstance(v, np.integer):
            return repr(int(v))
        if isinstance(v, np.bool_):
            return repr(bool(v))
        return repr(v)

    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    mat = sorted(
        tuple(norm(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    return cols, mat


@pytest.fixture(scope="module")
def mega_dir(tmp_path_factory) -> str:
    """A synthetic events table where ONE user exceeds the cap.

    user 1 (mega): 10,500 funnel events 1 s apart — view first, then
      clicks, with its ONLY purchase at position 10,450, i.e. BEYOND
      the 10,000-event cap. Every capped builder must therefore see a
      non-converting user where the uncapped data says converting.
    user 2: small view->click->purchase funnel (10 min apart).
    user 3: view then error (non-converting, 2-type path).
    user 4: exactly one view (bounce pattern).
    user 5: signup/view/click split across two >30-min-gap sessions.
    Two user-2 events share a timestamp to exercise the event_id
    tie-break of the (ts, event_id) total order.
    """
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows: list[tuple] = []
    eid = 0

    def add(user: int, sec: int, etype: str) -> None:
        nonlocal eid
        eid += 1
        rows.append(
            (eid, base + pd.Timedelta(seconds=sec), user, etype,
             float(sec % 97) / 7.0, "{}")
        )

    n_mega = MAX_EVENTS_PER_KEY + 500
    purchase_at = MAX_EVENTS_PER_KEY + 450  # strictly beyond the cap
    for i in range(n_mega):
        if i == 0:
            t = "view"
        elif i == purchase_at:
            t = "purchase"
        else:
            t = "click"
        add(1, i, t)

    add(2, 0, "view")
    add(2, 600, "click")
    add(2, 600, "click")  # same ts, higher event_id: tie-break row
    add(2, 1200, "purchase")

    add(3, 0, "view")
    add(3, 300, "error")

    add(4, 0, "view")

    add(5, 0, "signup")
    add(5, 60, "view")
    add(5, 60 + 40 * 60, "click")  # 40-min gap: second session

    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    out = tmp_path_factory.mktemp("cap_parity")
    pdf.to_parquet(os.path.join(out, "events.parquet"), index=False)
    return str(out)


@pytest.fixture(scope="module")
def oracle_con(mega_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM '{mega_dir}/events.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", CAPPED_QUERIES)
def test_spark_matches_capped_oracle_above_cap(
    spark, mega_dir, oracle_con, name
):
    spdf = all_queries()[name](spark, mega_dir).toPandas()
    opdf = oracle_con.sql(_REGISTRY[name].oracle).df()
    s_cols, s_mat = _canon(spdf)
    o_cols, o_mat = _canon(opdf)
    assert s_cols == o_cols
    assert s_mat == o_mat, (
        f"{name}: Spark and capped oracle disagree above the cap"
    )


def test_cap_actually_bites(oracle_con):
    """Power check: the UNCAPPED form of each oracle disagrees with
    the capped one on this corpus — so the parity test above is not
    vacuously green. (Stripping the cap = raising it beyond the
    mega-user's event count.)"""
    uncapped_differs = 0
    for name in CAPPED_QUERIES:
        capped_sql = _REGISTRY[name].oracle
        assert f"<= {MAX_EVENTS_PER_KEY}" in capped_sql, (
            f"{name}: oracle lost its QUALIFY cap"
        )
        uncapped_sql = capped_sql.replace(
            f"<= {MAX_EVENTS_PER_KEY}", f"<= {MAX_EVENTS_PER_KEY * 1000}"
        )
        a = _canon(oracle_con.sql(capped_sql).df())
        b = _canon(oracle_con.sql(uncapped_sql).df())
        if a != b:
            uncapped_differs += 1
    assert uncapped_differs == len(CAPPED_QUERIES)
