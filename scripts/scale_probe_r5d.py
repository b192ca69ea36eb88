"""Round-5 batch 6-10 scale probe: matching, skyline, rank stats,
bipartiteness at synthetic volume.

1. ``greedy_matching`` on a 500k-edge random graph (100k nodes) —
   converge-or-raise holds, round count stays O(log n).
2. ``skyline_2d`` on 10M correlated points — the bucket suffix-max
   prune must collapse the exact pass to a near-frontier sliver
   (candidate count printed); plus the anti-correlated worst case
   (100k points all on the frontier) proving the max_candidates guard
   raises instead of sorting a data-sized set in one task.
3. ``mann_whitney_u`` on 20M rows / 2 groups with ~1M distinct values —
   the bucketed exclusive-prefix carry-in never materializes a
   data-sized single-partition window.
4. ``bipartite_check`` on a 1M-edge random bipartite graph — one CC run
   on the doubled list; verdict must be uniformly true.

Usage::

    PYTHONPATH=/root/repo python scripts/scale_probe_r5d.py

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


def probe_matching(spark) -> dict:
    from polars_grouper_spark.operators.matching import greedy_matching

    n_nodes, n_edges = 100_000, 500_000
    edges = (
        spark.range(n_edges)
        .select(
            (F.pmod(F.xxhash64("id"), F.lit(n_nodes))).alias("s"),
            (F.pmod(F.xxhash64(F.col("id") + 1_000_000_000), F.lit(n_nodes))).alias(
                "d"
            ),
        )
        .select(
            F.concat(F.lit("n"), "s").alias("from"),
            F.concat(F.lit("n"), "d").alias("to"),
        )
    )
    t0 = time.time()
    m = greedy_matching(edges, max_rounds=60)
    n_pairs = m.count()
    wall = time.time() - t0
    # validity: no node twice
    used = m.select(F.col("a").alias("n")).unionAll(m.select("b"))
    dup = used.groupBy("n").count().where(F.col("count") > 1).count()
    return {
        "probe": "greedy_matching",
        "n_edges": n_edges,
        "n_pairs": n_pairs,
        "dup_nodes": dup,
        "wall_s": round(wall, 1),
    }


def probe_skyline(spark) -> dict:
    from polars_grouper_spark.operators.skyline import skyline_2d

    n = 10_000_000
    pts = spark.range(n).select(
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1000.0).alias("x"),
        (
            F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1000.0
            + F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1000)) / 10.0
        ).alias("y"),
    )
    t0 = time.time()
    sky = skyline_2d(pts, "x", "y")
    n_sky = sky.count()
    wall = time.time() - t0

    anti = spark.range(100_000).select(
        F.col("id").cast("double").alias("x"),
        (F.lit(100_000) - F.col("id")).cast("double").alias("y"),
    )
    raised = False
    try:
        skyline_2d(anti, "x", "y", max_candidates=50_000).count()
    except RuntimeError:
        raised = True
    return {
        "probe": "skyline_2d",
        "n_points": n,
        "n_skyline": n_sky,
        "anticorrelated_guard_raised": raised,
        "wall_s": round(wall, 1),
    }


def probe_mann_whitney(spark) -> dict:
    from polars_grouper_spark.functions.experiment import mann_whitney_u

    n = 20_000_000
    df = spark.range(n).select(
        F.when(F.pmod("id", F.lit(2)) == 0, "A").otherwise("B").alias("g"),
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 100.0).alias("v"),
    )
    t0 = time.time()
    r = mann_whitney_u(df, "g", "v", "A", "B").collect()[0]
    wall = time.time() - t0
    return {
        "probe": "mann_whitney_u",
        "n_rows": n,
        "n_a": r.n_a,
        "z": round(r.z, 4),
        "wall_s": round(wall, 1),
    }


def probe_bipartite(spark) -> dict:
    from polars_grouper_spark.operators.bipartite import bipartite_check

    n_side, n_edges = 100_000, 1_000_000
    edges = spark.range(n_edges).select(
        F.concat(F.lit("u"), F.pmod(F.xxhash64("id"), F.lit(n_side))).alias(
            "from"
        ),
        F.concat(
            F.lit("v"), F.pmod(F.xxhash64(F.col("id") + 13), F.lit(n_side))
        ).alias("to"),
    )
    t0 = time.time()
    out = bipartite_check(edges)
    bad = out.where(~F.col("is_bipartite")).count()
    n_nodes = out.count()
    wall = time.time() - t0
    return {
        "probe": "bipartite_check",
        "n_edges": n_edges,
        "n_nodes": n_nodes,
        "non_bipartite_nodes": bad,
        "wall_s": round(wall, 1),
    }


def main() -> None:
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    for fn in (probe_matching, probe_skyline, probe_mann_whitney, probe_bipartite):
        print(json.dumps(fn(spark)), flush=True)


if __name__ == "__main__":
    main()
