"""Tests for the paged REST API source (sources/rest.py): page-level
batching honors the API page size, enrichment is deterministic, and
not-found ids feed the anti-join."""

from __future__ import annotations

from pyspark.sql import Row

from se_data_pipeline_spark.sources.rest import (
    FakeChannelApi,
    enrich_ids,
    notfound_ids,
)


def _ids_df(spark, n):
    return spark.createDataFrame([Row(id=f"UC{i:06d}") for i in range(n)])


def test_enrich_pages_and_fields(spark):
    backend = FakeChannelApi()
    df = enrich_ids(_ids_df(spark, 120), backend, page_size=50)
    rows = df.collect()
    assert len(rows) == 120  # one output row per input id
    found = [r for r in rows if r["found"]]
    missing = [r for r in rows if not r["found"]]
    assert len(found) > 0 and len(missing) > 0
    for r in found:
        assert r["n_subs"] is not None and r["custom_url"].startswith("@")
    for r in missing:
        assert r["n_videos"] is None


def test_page_size_contract(spark):
    rows = enrich_ids(_ids_df(spark, 120), FakeChannelApi(), page_size=50).collect()
    # every id fetched exactly once, pages hold ≤ 50 ids, 3 pages total
    assert len({r["id"] for r in rows}) == 120
    pages: dict[int, int] = {}
    for r in rows:
        pages[r["page"]] = pages.get(r["page"], 0) + 1
    assert sorted(pages) == [0, 1, 2]
    assert all(n <= 50 for n in pages.values())


def test_notfound_feed_is_deterministic(spark):
    backend = FakeChannelApi()
    a = sorted(
        r["id"]
        for r in notfound_ids(
            enrich_ids(_ids_df(spark, 200), backend)
        ).collect()
    )
    b = sorted(
        r["id"]
        for r in notfound_ids(
            enrich_ids(_ids_df(spark, 200), FakeChannelApi())
        ).collect()
    )
    assert a == b and len(a) > 0


# ------------------------------------------------- Python DataSource


def test_python_datasource_partitions_per_page_and_matches_operator(spark):
    """The Spark 4 Python DataSource delivery of S7 must (a) expose
    one input partition per API page, and (b) return exactly the rows
    the mapInPandas page-operator form produces for the same ids —
    two deliveries, one contract."""
    from se_data_pipeline_spark.sources import pyds
    from se_data_pipeline_spark.sources.rest import FakeChannelApi, enrich_ids

    ids = [f"chan{i:04d}" for i in range(120)]
    pyds.register(spark)
    df = (
        spark.read.format("channel_api")
        .option("ids", ",".join(ids))
        .option("page_size", "50")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # 120 ids / 50 per page

    got = {
        r["id"]: (r["n_videos"], r["n_views"], r["n_subs"], r["custom_url"])
        for r in df.collect()
    }

    # The operator form KEEPS not-found ids as null rows (anti-join
    # feed); the DataSource omits them (absent = not found). Found
    # rows must agree exactly; the DataSource's absences must be
    # exactly the operator's null rows.
    ids_df = spark.createDataFrame([(i,) for i in ids], "id string")
    op_rows = enrich_ids(ids_df, FakeChannelApi()).collect()
    via_operator = {
        r["id"]: (r["n_videos"], r["n_views"], r["n_subs"], r["custom_url"])
        for r in op_rows
        if r["n_videos"] is not None
    }
    assert got == via_operator
    assert 0 < len(got) < 120  # some ids are not-found by design
    op_notfound = {r["id"] for r in op_rows if r["n_videos"] is None}
    assert set(ids) - set(got) == op_notfound


def test_streaming_datasource_pages_match_batch(spark, tmp_path):
    """The streaming (offset-per-page) and batch (partition-per-page)
    DataSource deliveries must produce the same found set; the page
    offset advances once per micro-batch and parks when exhausted."""
    from se_data_pipeline_spark.sources import pyds

    pyds.register(spark)
    pyds.register_stream(spark)
    n = 120
    stream = (
        spark.readStream.format("channel_api_stream")
        .option("n_ids", str(n))
        .option("page_size", "50")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_chan_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["id"], r["n_subs"])
        for r in spark.sql("SELECT id, n_subs FROM t_chan_stream").collect()
    }

    ids = ",".join(f"chan{i:04d}" for i in range(n))
    batch = {
        (r["id"], r["n_subs"])
        for r in spark.read.format("channel_api")
        .option("ids", ids)
        .option("page_size", "50")
        .load()
        .collect()
    }
    assert got == batch and len(got) > 0


# --------------------------------------------- requests adapter (S7)
# Recorded-fixture tests in the yt-dlp adapter style: a fake session
# returns response JSON shaped exactly like the YouTube Data API v3
# (test2.py:11-36, starngage_crawler.ipynb cell 4); no network.


class _FakeResp:
    def __init__(self, status_code, payload):
        self.status_code = status_code
        self._payload = payload

    def json(self):
        return self._payload


class _FakeSession:
    """Scripted session: pops one (status, payload) per get(); records
    every (url, params) for contract asserts."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.calls = []

    def get(self, url, params=None):
        self.calls.append((url, dict(params or {})))
        return _FakeResp(*self.responses.pop(0))


def _channels_payload(ids_stats):
    return {
        "items": [
            {
                "id": cid,
                "snippet": {"customUrl": f"@{cid.lower()}"},
                "statistics": stats,
            }
            for cid, stats in ids_stats
        ]
    }


def test_requests_channels_list_params_and_parse():
    from se_data_pipeline_spark.sources.rest import (
        CHANNELS_URL,
        RequestsChannelApi,
    )

    sess = _FakeSession([
        (200, _channels_payload([
            ("UCAAA", {"videoCount": "120", "viewCount": "9999",
                       "subscriberCount": "55000"}),
            # hidden subscriber count: statistics key absent -> null
            ("UCBBB", {"videoCount": "3", "viewCount": "10"}),
        ])),
    ])
    api = RequestsChannelApi("KEY123", session=sess)
    got = api.fetch_page(["UCAAA", "UCBBB", "UCGONE"])
    (url, params), = sess.calls
    assert url == CHANNELS_URL
    assert params["part"] == "snippet,statistics,topicDetails"
    assert params["id"] == "UCAAA,UCBBB,UCGONE"
    assert params["key"] == "KEY123"
    assert got["UCAAA"] == {
        "n_videos": 120, "n_views": 9999, "n_subs": 55000,
        "custom_url": "@ucaaa",
    }
    assert got["UCBBB"]["n_subs"] is None  # P12: typed null, not "N/A"
    assert "UCGONE" not in got  # absent means absent (§7.4(8))


def test_requests_search_follows_page_tokens():
    from se_data_pipeline_spark.sources.rest import (
        SEARCH_URL,
        RequestsChannelApi,
    )

    def _search_payload(n0, n, token):
        p = {
            "items": [
                {"snippet": {
                    "channelId": f"UC{i:04d}", "title": f"t{i}",
                    "description": "d", "publishedAt": "2024-01-01T00:00:00Z",
                }}
                for i in range(n0, n0 + n)
            ]
        }
        if token:
            p["nextPageToken"] = token
        return p

    sess = _FakeSession([
        (200, _search_payload(0, 50, "TOK1")),
        (200, _search_payload(50, 50, "TOK2")),
        (200, _search_payload(100, 7, None)),
    ])
    api = RequestsChannelApi("K", session=sess)
    chans = api.search_channels("tài chính OR đầu tư")
    assert len(chans) == 107
    assert chans[0]["channel_id"] == "UC0000"
    assert chans[-1]["channel_id"] == "UC0106"
    # pagination contract: first call has no pageToken, then TOK1, TOK2
    toks = [p.get("pageToken") for _, p in sess.calls]
    assert toks == [None, "TOK1", "TOK2"]
    assert all(u == SEARCH_URL for u, _ in sess.calls)
    assert sess.calls[0][1]["type"] == "channel"  # test2.py:15


def test_requests_search_bounds_runaway_cursor():
    from se_data_pipeline_spark.sources.rest import RequestsChannelApi

    # a cursor that never exhausts must stop at max_pages
    sess = _FakeSession(
        [(200, {"items": [], "nextPageToken": "AGAIN"})] * 5
    )
    api = RequestsChannelApi("K", session=sess)
    api.search_channels("q", max_pages=3)
    assert len(sess.calls) == 3


def test_quota_error_taxonomy():
    import pytest

    from se_data_pipeline_spark.sources.rest import (
        ERR_API,
        ERR_API_KEY,
        ERR_QUOTA,
        ApiQuotaError,
        RequestsChannelApi,
        classify_api_response,
    )

    quota = {"error": {"code": 403, "errors": [
        {"reason": "quotaExceeded", "domain": "youtube.quota"}]}}
    badkey = {"error": {"code": 400, "errors": [{"reason": "keyInvalid"}]}}
    other = {"error": {"code": 500, "errors": [{"reason": "backendError"}]}}
    assert classify_api_response(200, {"items": []}) is None
    assert classify_api_response(403, quota) == ERR_QUOTA
    assert classify_api_response(400, badkey) == ERR_API_KEY
    assert classify_api_response(500, other) == ERR_API

    api = RequestsChannelApi("K", session=_FakeSession([(403, quota)]))
    with pytest.raises(ApiQuotaError) as ei:
        api.fetch_page(["UCX"])
    assert ei.value.error_class == ERR_QUOTA


def test_enrich_ids_dead_letters_quota_failed_pages(spark):
    """A quota-failed page dead-letters its rows (error_class set,
    found=false) instead of crashing the task; healthy pages keep
    flowing and notfound_ids excludes the API-error rows."""
    from se_data_pipeline_spark.sources.acquire import split_dead_letter
    from se_data_pipeline_spark.sources.rest import (
        ERR_QUOTA,
        ApiQuotaError,
        enrich_ids,
        notfound_ids,
    )

    class _QuotaAfterOnePage:
        """First page succeeds (all ids found), later pages hit quota."""

        def __init__(self):
            self.pages = 0

        def fetch_page(self, ids):
            self.pages += 1
            if self.pages > 1:
                raise ApiQuotaError(ERR_QUOTA, "quotaExceeded")
            return {
                cid: {"n_videos": 1, "n_views": 2, "n_subs": 3,
                      "custom_url": f"@{cid}"}
                for cid in ids
            }

    df = enrich_ids(_ids_df(spark, 100), _QuotaAfterOnePage(), page_size=50)
    rows = df.collect()
    assert len(rows) == 100
    dead_rows = [r for r in rows if r["error_class"] is not None]
    ok_rows = [r for r in rows if r["error_class"] is None]
    assert len(dead_rows) == 50 and len(ok_rows) == 50
    assert all(r["error_class"] == ERR_QUOTA and not r["found"]
               for r in dead_rows)
    assert all(r["found"] and r["n_subs"] == 3 for r in ok_rows)
    # dead-letter routing reuses the acquire-side splitter (T4)
    ok, dead = split_dead_letter(df)
    assert ok.count() == 50 and dead.count() == 50
    # quota rows are NOT "not found" — the API never answered
    assert notfound_ids(df).count() == 0
