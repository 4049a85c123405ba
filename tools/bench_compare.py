"""Compare two bench.py outputs (raw one-line JSON or the driver's
BENCH_r*.json wrapper with a `parsed` field): common-subset totals
and the biggest per-query movers.

Usage: python tools/bench_compare.py OLD.json NEW.json [top_n]
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d and "parsed" in d:
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no queries found (failed bench run?)")
    return d


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    t_old = sum(oq[k] for k in common)
    t_new = sum(nq[k] for k in common)
    print(
        f"common {len(common)} queries: {t_old:.2f}s -> {t_new:.2f}s "
        f"({(t_new - t_old) / t_old * 100:+.1f}%)"
    )
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
