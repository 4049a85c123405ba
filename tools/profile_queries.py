"""Per-query timing at an arbitrary sf_dir with unbuffered progress —
the iterate-on-performance loop. Usage:
    python tools/profile_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from se_data_pipeline_spark.queries import all_queries
from se_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:]
    spark = get_spark("profile")
    qs = all_queries()
    names = only or list(qs)
    qs["pricing_summary"](spark, sf_dir).collect()  # warmup
    for name in names:
        t0 = time.perf_counter()
        n = len(qs[name](spark, sf_dir).collect())
        print(f"{name:40s} {time.perf_counter()-t0:8.2f}s  {n} rows", flush=True)


if __name__ == "__main__":
    main()
