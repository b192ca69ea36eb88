"""Time individual bench queries: python scripts/time_query.py name [name...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Runs each query REPS times (default 2) and prints per-run seconds — run 1
includes JVM/scan warmup, run 2 approximates steady state.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from polars_grouper_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "2"))
    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    for name in sys.argv[1:]:
        times = []
        for _ in range(reps):
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            times.append(round(time.time() - t0, 3))
        print(f"{name:28s} rows={n:<8d} " + " ".join(f"{t:7.3f}" for t in times))


if __name__ == "__main__":
    main()
