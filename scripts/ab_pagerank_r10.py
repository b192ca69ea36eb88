"""Round-10 A/B: pagerank pre-loop shapes (VERDICT r9 item 1).

Shapes, bucketed path:
  A (HEAD/r9): checkpoint pair_cnt, intern nodes from it, write bucketed.
  B (r8):      intern nodes from RAW edges, lazy pair_cnt -> bucketed write.
Shapes, sp (broadcast) path:
  A2 (HEAD/r9): checkpoint edges_w first, nodes from it.
  B2 (r8):      nodes from RAW edges, then checkpoint edges_w.

Interleaved reps in ONE session, pinned against bloom_join_lineitem
(floor 2.23 s) so a host stall window is visible in the data.
"""

from __future__ import annotations

import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from pyspark.sql import functions as F, Window  # noqa: E402
from polars_grouper_spark.session import get_spark  # noqa: E402
from polars_grouper_spark.plans.iteration import truncate_lineage  # noqa: E402
from polars_grouper_spark.plans.bucketing import bucket_table  # noqa: E402
from polars_grouper_spark.operators.pagerank import (  # noqa: E402
    _power_iteration,
    _shuffle_partitions,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS, DAMP = 5, 0.85


def _edges(spark):
    return entry_mod._sp_edges(spark, SF)


def bucketed(spark, shape: str):
    df = _edges(spark)
    edges = df.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    ).where(F.col("src").isNotNull() & F.col("dst").isNotNull())

    if shape == "A":  # HEAD / r9
        pair_cnt = truncate_lineage(
            edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cnt"))
        )
        nodes = (
            pair_cnt.select(F.col("src").alias("node"))
            .union(pair_cnt.select(F.col("dst").alias("node")))
            .distinct()
        )
    else:  # B: r8
        pair_cnt = edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cnt"))
        nodes = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
    nodes = truncate_lineage(nodes)
    n = nodes.count()
    edges_w = pair_cnt.select(
        "src",
        "dst",
        (F.col("cnt") / F.sum("cnt").over(Window.partitionBy("src"))).alias("w"),
    )
    n_buckets = max(4, min(_shuffle_partitions(spark.conf), n // 50_000))
    table_name = f"pgs_ab_{uuid.uuid4().hex[:12]}"
    edges_w = bucket_table(edges_w, table_name, "src", n_buckets=n_buckets, sort=True)
    try:
        pr = _power_iteration(
            nodes, edges_w, n, DAMP, ITERS, 0.0, broadcast_ranks=False
        )
        return pr.select("node", F.round("score", 8).alias("score")).count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")


def sp(spark, shape: str):
    df = _edges(spark)
    edges = df.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    ).where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    pair_cnt = edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cnt"))
    edges_w = truncate_lineage(
        pair_cnt.select(
            "src",
            "dst",
            (F.col("cnt") / F.sum("cnt").over(Window.partitionBy("src"))).alias("w"),
        )
    )
    if shape == "A2":  # HEAD / r9: nodes from the checkpointed pair table
        src_tbl = edges_w
    else:  # B2: r8 nodes from raw edges
        src_tbl = edges
    nodes = (
        src_tbl.select(F.col("src").alias("node"))
        .union(src_tbl.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes = truncate_lineage(nodes)
    n = nodes.count()
    pr = _power_iteration(nodes, edges_w, n, DAMP, ITERS, 0.0, broadcast_ranks=True)
    return pr.select("node", F.round("score", 8).alias("score")).count()


def main():
    spark = get_spark("ab-pagerank")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    def t(fn):
        t0 = time.time()
        r = fn()
        return round(time.time() - t0, 3), r

    # warmup + pin
    qs["bloom_join_lineitem"](spark, SF).count()
    pin0, _ = t(lambda: qs["bloom_join_lineitem"](spark, SF).count())
    print(f"pin bloom_join_lineitem: {pin0:.3f} (floor 2.23)")

    for label, fn in [
        ("bucketed", bucketed),
        ("sp", sp),
    ]:
        shapes = ("A", "B") if label == "bucketed" else ("A2", "B2")
        res = {s: [] for s in shapes}
        for rep in range(3):
            for s in shapes:
                dt, n = t(lambda s=s: fn(spark, s))
                res[s].append(dt)
                print(f"{label} {s} rep{rep}: {dt:.3f} rows={n}")
        for s in shapes:
            print(f"{label} {s}: min={min(res[s]):.3f} all={res[s]}")
    pin1, _ = t(lambda: qs["bloom_join_lineitem"](spark, SF).count())
    print(f"pin bloom_join_lineitem end: {pin1:.3f}")


if __name__ == "__main__":
    main()
