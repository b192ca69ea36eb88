"""Round-5 scale probe (VERDICT r4 #5): the round-4 operators that had
no measured numbers yet.

1. ``fuzzy_join_ed1`` on the FULLY-adversarial short-string corpus —
   every string of length <= 4 over a 26-letter alphabet (~475k distinct
   values, every possible ed-1 neighbor present).  Short strings were
   the documented hot-key watch-point; the probe measures the actual
   max bucket size (theory: 1 + (L+1)*26) and total candidate volume.
2. ``neighbor_agg`` at 10M edges / 6M nodes — past the 5M-row broadcast
   threshold, so the loop runs its shuffle-join fallback.  Verifies the
   fallback completes and reports per-hop timing + shuffle bytes.
3. ``hits`` on a 10M-edge power-law graph (max degree ~10^4 by
   construction) at iters=2 — the broadcast-state loop at real volume;
   the overflow guard path is unit-tested separately
   (``tests/test_hits.py``).

Usage::

    PYTHONPATH=/root/repo python scripts/scale_probe_r5.py

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


def probe_fuzzy_adversarial(spark, meter) -> dict:
    from polars_grouper_spark.functions.fuzzy import fuzzy_join_ed1, neighborhood_keys

    # all strings of length 0..4 over a..z: 1 + 26 + 676 + 17576 + 456976
    letters = spark.range(26).select(
        F.char(F.col("id") + 97).alias("c")
    )
    words = spark.createDataFrame([("",)], "v string")
    layer = words
    for _ in range(4):
        layer = layer.crossJoin(letters).select(
            F.concat("v", "c").alias("v")
        )
        words = words.union(layer)
    words = words.repartition(32).cache()
    n = words.count()

    # actual bucket sizes of the deletion-neighborhood index
    buckets = (
        words.select(F.explode(neighborhood_keys(F.col("v"))).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df").alias("max_df"), F.count(F.lit(1)).alias("n_keys"))
        .first()
    )

    (r0, w0) = meter.snapshot()
    t0 = time.time()
    pairs = fuzzy_join_ed1(words, words, "v", "v").count()
    dt = time.time() - t0
    (r1, w1) = meter.snapshot()
    words.unpersist()
    return {
        "probe": "fuzzy_ed1_adversarial",
        "distinct_values": n,
        "max_key_df": int(buckets["max_df"]),
        "n_keys": int(buckets["n_keys"]),
        "ed1_pairs": pairs,
        "sec": round(dt, 1),
        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
    }


def probe_neighbor_agg_shuffle_fallback(spark, meter, n_edges: int) -> dict:
    from polars_grouper_spark.operators.neighbor_agg import (
        _BROADCAST_STATE_ROWS,
        neighbor_agg,
    )

    n_nodes = 6_000_000
    assert n_nodes > _BROADCAST_STATE_ROWS  # force the shuffle-join path
    edges = power_law_edges(spark, n_edges, n_nodes)
    feats = spark.range(n_nodes).select(
        F.concat(F.lit("n"), F.col("id")).alias("node"),
        (F.col("id") % 1000 / 10.0).alias("feat"),
    )
    (r0, w0) = meter.snapshot()
    t0 = time.time()
    out = neighbor_agg(edges, feats, id_col="node", feat_col="feat", hops=2)
    rows = out.count()
    dt = time.time() - t0
    (r1, w1) = meter.snapshot()
    return {
        "probe": "neighbor_agg_10m_shuffle_fallback",
        "n_edges": n_edges,
        "n_nodes": n_nodes,
        "out_rows": rows,
        "sec": round(dt, 1),
        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
    }


def probe_hits_10m(spark, meter, n_edges: int) -> dict:
    from polars_grouper_spark.operators.hits import hits

    edges = power_law_edges(spark, n_edges, 1_000_000)
    (r0, w0) = meter.snapshot()
    t0 = time.time()
    out = hits(edges, iters=2)
    rows = out.count()
    mx = out.agg(F.max("authority")).first()[0]
    dt = time.time() - t0
    (r1, w1) = meter.snapshot()
    return {
        "probe": "hits_10m_powerlaw",
        "n_edges": n_edges,
        "out_rows": rows,
        "max_authority": int(mx),
        "sec": round(dt, 1),
        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
    }


def main() -> None:
    spark = build_session()
    meter = ShuffleMeter(spark)
    print(json.dumps(probe_fuzzy_adversarial(spark, meter)))
    print(json.dumps(probe_neighbor_agg_shuffle_fallback(spark, meter, 10_000_000)))
    print(json.dumps(probe_hits_10m(spark, meter, 10_000_000)))


if __name__ == "__main__":
    main()
