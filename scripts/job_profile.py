"""Per-query job breakdown profiler (guide §1: measure first).

For each named registry query: one warm run, then one measured run with
the job list diffed through the UI REST API — per job: duration, task
count, task time, shuffle bytes, and the first call-site line.  This
answers the question the bench totals cannot: is a query slow because of
ONE expensive stage or because of N× per-job scheduling overhead
(driver-loop rounds, checkpoints, counts)?

Usage: SPARK_GRAFT_SF_DIR=... python scripts/job_profile.py q1 [q2 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402


def build_spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE", "32")
    return (
        SparkSession.builder.appName("job-profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.cleaner.periodicGC.interval", "60s")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def job_rows(spark):
    """All completed jobs from the AppStatusStore (works with UI off):
    (jobId, duration_s, numTasks, name)."""
    sc = spark.sparkContext
    try:
        sc._jsc.sc().listenerBus().waitUntilEmpty()
    except Exception:  # noqa: BLE001
        pass
    store = sc._jsc.sc().statusStore()
    lst = sc._jvm.scala.collection.JavaConverters.seqAsJavaList(store.jobsList(None))
    out = []
    for j in lst:
        try:
            sub = j.submissionTime()
            comp = j.completionTime()
            dur = (
                (comp.get().getTime() - sub.get().getTime()) / 1000.0
                if sub.isDefined() and comp.isDefined()
                else float("nan")
            )
            out.append((j.jobId(), dur, j.numTasks(), str(j.name())[:100]))
        except Exception:  # noqa: BLE001
            pass
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    # light warmup
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(64, numPartitions=8).mapInPandas(lambda it: it, "id long").count()
    for name in sys.argv[1:]:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf_dir).count()  # warm rep
        warm = time.time() - t0
        seen = {r[0] for r in job_rows(spark)}
        t0 = time.time()
        fn(spark, sf_dir).count()  # measured rep
        wall = time.time() - t0
        time.sleep(0.3)
        new = sorted(r for r in job_rows(spark) if r[0] not in seen)
        print(f"\n=== {name}  warm={warm:.2f}s measured={wall:.2f}s jobs={len(new)}")
        tot = 0.0
        for jid, dur, ntasks, jname in new:
            tot += dur if dur == dur else 0.0
            print(f"  job {jid:>4} {dur:6.2f}s tasks={ntasks:>4} {jname}")
        print(f"  sum job durations: {tot:.2f}s (gaps = {wall - tot:.2f}s)")
    spark.stop()


if __name__ == "__main__":
    main()
