"""Round-6 batch-3 scale probes: three asserted-but-unprobed claims.

1. ``asof_join`` at 50M left x 5M right over 100k keys — the claim: the
   union+window plan is ONE shuffle on the by-key, so wall scales with
   the sort, not a range-join blowup.  Correctness spot: matched right
   timestamps must be <= left timestamps (backward direction).
2. ``time_rollup`` (GROUPING SETS over NTZ truncations) at 50M events,
   hour+day resolutions — the claim: one scan + one hash aggregation,
   not one group-by per resolution; wall compared against two separate
   group-bys as the baseline.
3. ``topological_levels`` at a 10M-edge layered DAG (~20 levels) — the
   claim: rounds = depth, each round two anti-joins over a SHRINKING set;
   also the steady-state number for the query the round-6 closing bench
   flagged as environment-noisy at sf0.1.

Usage::

    PYTHONPATH=/root/repo python scripts/scale_probe_r6c.py

Prints one JSON object per probe; paste numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from scale_probe import build_session  # noqa: E402


def probe_asof(spark) -> dict:
    from polars_grouper_spark.operators.asof_join import asof_join

    n_left, n_right, n_keys = 50_000_000, 5_000_000, 100_000
    left = spark.range(n_left, numPartitions=64).select(
        F.col("id").alias("lid"),
        F.pmod(F.xxhash64("id"), F.lit(n_keys)).alias("k"),
        F.pmod(F.xxhash64(F.col("id") + 3), F.lit(10_000_000)).alias("t"),
    )
    right = spark.range(n_right, numPartitions=64).select(
        F.pmod(F.xxhash64(F.col("id") + 17), F.lit(n_keys)).alias("k"),
        F.pmod(F.xxhash64(F.col("id") + 29), F.lit(10_000_000)).alias("t"),
        (F.pmod(F.xxhash64(F.col("id") + 31), F.lit(1000)) / 10.0).alias("px"),
    )
    t0 = time.time()
    out = asof_join(left, right, on="t", by="k")
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("px").isNotNull().cast("long")).alias("n_matched"),
        F.max(
            (F.col("t_right") > F.col("t")).cast("int")
        ).alias("violations"),
    ).collect()[0]
    wall = time.time() - t0
    return {
        "probe": "asof_join_50m",
        "left": n_left,
        "right": n_right,
        "keys": n_keys,
        "out_rows": agg["n"],
        "matched": agg["n_matched"],
        "direction_violations": int(agg["violations"] or 0),
        "wall_s": round(wall, 1),
    }


def probe_rollup(spark) -> dict:
    from polars_grouper_spark.streaming.rollup import time_rollup

    n = 50_000_000
    ev = spark.range(n, numPartitions=64).select(
        F.expr(
            "timestampadd(SECOND, CAST(pmod(xxhash64(id), 31536000) AS INT), "
            "TIMESTAMP_NTZ '2024-01-01 00:00:00')"
        ).alias("ts"),
        F.pmod(F.xxhash64(F.col("id") + 7), F.lit(5)).alias("seg"),
        (F.pmod(F.xxhash64(F.col("id") + 11), F.lit(1000)) / 10.0).alias("v"),
    )
    t0 = time.time()
    out = time_rollup(
        ev,
        [F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("sv")],
        key_cols=["seg"],
        resolutions=["hour", "day"],
    )
    n_out = out.count()
    wall_one_pass = time.time() - t0

    # baseline: two separate truncate+group-bys (two scans, two aggs)
    from polars_grouper_spark.functions.timeutil import date_trunc_ntz

    t0 = time.time()
    n_base = 0
    for r in ("hour", "day"):
        n_base += (
            ev.groupBy(date_trunc_ntz(r, "ts").alias("b"), "seg")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2))
            .count()
        )
    wall_two_pass = time.time() - t0
    return {
        "probe": "time_rollup_50m",
        "events": n,
        "out_rows": n_out,
        "baseline_rows": n_base,
        "wall_grouping_sets_s": round(wall_one_pass, 1),
        "wall_two_groupbys_s": round(wall_two_pass, 1),
    }


def probe_toposort(spark) -> dict:
    from polars_grouper_spark.operators.toposort import topological_levels

    n_edges, n_levels, width = 10_000_000, 20, 50_000
    # layered DAG: nodes L{level}_{i}; each edge goes level k -> k+1
    edges = spark.range(n_edges, numPartitions=32).select(
        F.pmod(F.xxhash64("id"), F.lit(n_levels - 1)).alias("lv"),
        F.pmod(F.xxhash64(F.col("id") + 3), F.lit(width)).alias("a"),
        F.pmod(F.xxhash64(F.col("id") + 5), F.lit(width)).alias("b"),
    ).select(
        F.concat(F.lit("L"), "lv", F.lit("_"), "a").alias("from"),
        F.concat(F.lit("L"), F.col("lv") + 1, F.lit("_"), "b").alias("to"),
    )
    t0 = time.time()
    out = topological_levels(edges, "from", "to")
    per_level = {
        int(r["level"]): r["n"]
        for r in out.groupBy("level").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    wall = time.time() - t0
    return {
        "probe": "toposort_10m",
        "edges": n_edges,
        "levels_found": len(per_level),
        "nodes_labeled": sum(per_level.values()),
        "wall_s": round(wall, 1),
        "s_per_level": round(wall / max(len(per_level), 1), 2),
    }


def main() -> None:
    spark = build_session()
    for probe in (probe_asof, probe_rollup, probe_toposort):
        print(json.dumps(probe(spark)), flush=True)


if __name__ == "__main__":
    main()
