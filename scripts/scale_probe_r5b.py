"""Round-5 batch-2 scale probe: the new operators at synthetic volume.

1. ``rolling_active_count`` at 20M activity rows (500k users × 365
   days) — the DAU/WAU sweep's claim is ONE data-sized shuffle; the
   probe measures wall-clock and shuffle bytes, and sanity-checks the
   output tick count.
2. ``lpa_communities`` on a 5M-edge power-law graph, 3 rounds — label
   coalescing under real skew (hub nodes have huge distinct-label
   votes in round 1).
3. ``hll_ball_size`` radius 2 / b=6 on a 2M-edge power-law graph —
   register fan-out E × min(2^b, ball) is the predicted cost; the probe
   reports observed shuffle volume against that bound.
4. ``fastrp_embedding`` dim=32 on the same 2M-edge graph — two joins +
   two grouped sums; the integer-exact path at volume.
5. ``dup_spans`` over 200k synthetic docs (~300 chars) with 5% planted
   exact-duplicate 60-char spans — recall of planted duplication and
   end-to-end cost of the window/hash/semi-join pipeline.

Usage::

    PYTHONPATH=/root/repo python scripts/scale_probe_r5b.py

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

from scale_probe import ShuffleMeter, build_session, power_law_edges  # noqa: E402


def probe_rolling_active(spark, meter) -> dict:
    from polars_grouper_spark.operators.intervals import rolling_active_count

    n_rows, n_users, n_days = 20_000_000, 500_000, 365
    act = spark.range(n_rows).select(
        (F.col("id") % n_users).alias("user"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_days)).alias("day"),
    )
    (r0, w0) = meter.snapshot()
    t0 = time.time()
    out = rolling_active_count(act, "user", "day", 7)
    n_ticks = out.count()
    dt = time.time() - t0
    (r1, w1) = meter.snapshot()
    return {
        "probe": "rolling_active_20M",
        "rows": n_rows,
        "users": n_users,
        "ticks_out": n_ticks,
        "sec": round(dt, 1),
        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
    }


def probe_lpa(spark, meter) -> dict:
    from polars_grouper_spark.operators.communities import lpa_communities

    edges = power_law_edges(spark, 5_000_000, 1_000_000).cache()
    edges.count()
    (r0, w0) = meter.snapshot()
    t0 = time.time()
    out = lpa_communities(edges, "from", "to", rounds=3)
    n_nodes = out.count()
    n_comms = out.select("community").distinct().count()
    dt = time.time() - t0
    (r1, w1) = meter.snapshot()
    edges.unpersist()
    return {
        "probe": "lpa_5M_edges",
        "nodes": n_nodes,
        "communities": n_comms,
        "sec": round(dt, 1),
        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
    }


def probe_ball(spark, meter) -> dict:
    from polars_grouper_spark.operators.neighborhood import hll_ball_size

    edges = power_law_edges(spark, 2_000_000, 500_000).cache()
    edges.count()
    (r0, w0) = meter.snapshot()
    t0 = time.time()
    out = hll_ball_size(edges, "from", "to", radius=2, b=6)
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("estimate").alias("max_est"),
    ).first()
    dt = time.time() - t0
    (r1, w1) = meter.snapshot()
    edges.unpersist()
    return {
        "probe": "hll_ball_2M_edges_r2_b6",
        "nodes": int(stats["n"]),
        "max_ball_estimate": float(stats["max_est"]),
        "sec": round(dt, 1),
        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
    }


def probe_fastrp(spark, meter) -> dict:
    from polars_grouper_spark.operators.fastrp import fastrp_embedding

    edges = power_law_edges(spark, 2_000_000, 500_000).cache()
    edges.count()
    (r0, w0) = meter.snapshot()
    t0 = time.time()
    out = fastrp_embedding(edges, "from", "to", dim=32, portable=False)
    n = out.count()
    dt = time.time() - t0
    (r1, w1) = meter.snapshot()
    edges.unpersist()
    return {
        "probe": "fastrp_2M_edges_dim32",
        "embedding_rows": n,
        "sec": round(dt, 1),
        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
    }


def probe_dup_spans(spark, meter) -> dict:
    from polars_grouper_spark.functions.dedup import dup_spans

    n_docs, planted_every = 200_000, 20  # 5% of docs carry the span
    span = "THE-PLANTED-BOILERPLATE-SPAN-" + "Z" * 31  # 60 chars
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.sha2(F.concat(F.lit("a"), F.col("id").cast("string")), 256),
            F.sha2(F.concat(F.lit("b"), F.col("id").cast("string")), 256),
            F.when(F.col("id") % planted_every == 0, F.lit(span)).otherwise(
                F.sha2(F.concat(F.lit("c"), F.col("id").cast("string")), 256)
            ),
            F.sha2(F.concat(F.lit("d"), F.col("id").cast("string")), 256),
        ).alias("text"),
    ).cache()
    docs.count()
    (r0, w0) = meter.snapshot()
    t0 = time.time()
    out = dup_spans(docs, window=40, stride=10, portable=False).cache()
    flagged = out.where(F.col("n_dup_windows") > 0)
    n_flagged = flagged.count()
    planted_hit = flagged.where(F.col("id") % planted_every == 0).count()
    dt = time.time() - t0
    (r1, w1) = meter.snapshot()
    docs.unpersist()
    out.unpersist()
    return {
        "probe": "dup_spans_200k_docs",
        "docs": n_docs,
        "planted": n_docs // planted_every,
        "planted_recalled": planted_hit,
        "total_flagged": n_flagged,
        "sec": round(dt, 1),
        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
    }


def main() -> None:
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    meter = ShuffleMeter(spark)
    all_probes = {
        "rolling": probe_rolling_active,
        "lpa": probe_lpa,
        "ball": probe_ball,
        "fastrp": probe_fastrp,
        "dup_spans": probe_dup_spans,
    }
    names = sys.argv[1:] or list(all_probes)
    for name in names:
        print(json.dumps(all_probes[name](spark, meter)), flush=True)


if __name__ == "__main__":
    main()
