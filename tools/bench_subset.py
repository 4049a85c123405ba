"""Time a SUBSET of registry queries under bench.py's exact worker
protocol (fresh JVM, untimed warmup, min-of-2 with >15% confirm pass)
— the optimization round's before/after instrument, so subset numbers
are directly comparable to the committed BENCH_LOCAL_r*.json
archives without paying a full 296-query sweep per iteration.

Usage: python tools/bench_subset.py query [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_PASSES (default 2).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: bench_subset.py query [query ...]", file=sys.stderr)
        return 2
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    passes = os.environ.get("SPARK_GRAFT_BENCH_PASSES")
    with tempfile.TemporaryDirectory(prefix="bench_subset_") as td:
        spec = {
            "names": names,
            "sf_dir": sf_dir,
            "out": os.path.join(td, "out.json"),
        }
        if passes:
            spec["passes"] = int(passes)
        spec_path = os.path.join(td, "spec.json")
        with open(spec_path, "w") as fh:
            json.dump(spec, fh)
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py"),
             "--worker", spec_path],
            cwd=HERE,
        )
        if proc.returncode != 0:
            print(f"worker rc={proc.returncode}", file=sys.stderr)
            return 1
        with open(spec["out"]) as fh:
            res = json.load(fh)
    for n in names:
        if n in res.get("errors", {}):
            print(f"ERR   {n}: {res['errors'][n]}")
        else:
            samp = res["samples"].get(n, [])
            print(
                f"{res['queries'][n]:8.3f}  {n}   "
                f"samples={[round(s, 3) for s in samp]}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
