"""Compare two bench.py outputs (raw one-line JSON or the driver's
BENCH_r*.json wrapper with a `parsed` field): common-subset totals
and the biggest per-query movers.

Usage: python tools/bench_compare.py OLD.json NEW.json [top_n]
   or: python tools/bench_compare.py r8 r9 [top_n]

An `rN` argument resolves to the committed FULL-timing archive
BENCH_LOCAL_r{N}.json when present (every query, written by bench.py
since r9 — VERDICT r8 #3), else to the driver's BENCH_r0{N}.json
(top-35 only for rounds before the archives existed).
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def resolve(arg: str) -> str:
    m = re.fullmatch(r"r(\d+)", arg)
    if not m:
        return arg
    n = int(m.group(1))
    for cand in (
        os.path.join(REPO, f"BENCH_LOCAL_r{n}.json"),
        os.path.join(REPO, f"BENCH_r{n:02d}.json"),
    ):
        if os.path.exists(cand):
            return cand
    raise SystemExit(f"{arg}: no BENCH_LOCAL_r{n}.json or BENCH_r{n:02d}.json")


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d and "parsed" in d:
        d = d["parsed"]
    if not isinstance(d, dict) or "queries" not in d:
        raise SystemExit(f"{path}: no queries found (failed bench run?)")
    # bench.py's stdout line trims `queries` to the slowest 35 (tail
    # safety); the FULL per-query map lives in the file the
    # `queries_file` pointer names. Follow it when resolvable so
    # comparisons never silently lose the fast tail.
    qf = d.get("queries_file")
    if qf:
        followed = False
        for cand in (os.path.join(os.path.dirname(path), qf), qf):
            if os.path.exists(cand):
                with open(cand) as f:
                    full = json.load(f).get("queries", {})
                # BENCH_LOCAL.json is overwritten per run — only trust
                # it for THIS run if every trimmed entry matches it
                # exactly (a stale pointer from an older round won't).
                if all(full.get(k) == v for k, v in d["queries"].items()):
                    d = {**d, "queries": full}
                    followed = True
                break
        if not followed:
            print(
                f"warning: {path}: full-timings file {qf} absent or "
                f"stale — comparing the trimmed stdout map only",
                file=sys.stderr,
            )
    return d


def main() -> int:
    old, new = load(resolve(sys.argv[1])), load(resolve(sys.argv[2]))
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    t_old = sum(oq[k] for k in common)
    t_new = sum(nq[k] for k in common)
    print(
        f"common {len(common)} queries: {t_old:.2f}s -> {t_new:.2f}s "
        f"(raw {(t_new - t_old) / t_old * 100:+.1f}%)"
    )
    # Two-regime calibration (r7 VERDICT #2): the throughput calib
    # normalizes seconds-long scan/shuffle-bound queries, the latency
    # calib the sub-second scheduling-bound majority. Report all
    # three ratios; when they disagree, trust RAW unless the calibs
    # agree with each other (a throughput-only view claimed a phantom
    # uniform 1.24x regression in r7 while raw was flat).
    for field, label in (
        ("calib_sec", "throughput-calibrated"),
        ("calib_latency_sec", "latency-calibrated"),
        # r8: the shuffle+Arrow regime — the one the r8 forensics
        # showed the other two probes miss (compute calib flat while
        # every exchange-bearing query drifted ~1.3x with the host).
        ("calib_shuffle_sec", "shuffle-calibrated"),
    ):
        co, cn = old.get(field), new.get(field)
        if co and cn:
            ratio = (t_new / cn) / (t_old / co)
            print(
                f"  {label}: x{ratio:.3f} "
                f"({field} {co} -> {cn}; host "
                f"{'faster' if cn < co else 'slower'} by "
                f"{abs(cn - co) / co * 100:.1f}%)"
            )
        else:
            print(f"  {label}: n/a ({field} missing on one side)")
    movers = sorted(common, key=lambda k: nq[k] - oq[k])
    print("\nbiggest improvements:")
    for k in movers[:top_n]:
        print(f"  {nq[k] - oq[k]:+6.2f}s  {k}  {oq[k]:.2f} -> {nq[k]:.2f}")
    print("\nbiggest regressions:")
    for k in movers[-top_n:][::-1]:
        print(f"  {nq[k] - oq[k]:+6.2f}s  {k}  {oq[k]:.2f} -> {nq[k]:.2f}")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print(f"\nnew queries ({len(only_new)}):")
        for k in only_new:
            print(f"  {nq[k]:6.2f}s  {k}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
