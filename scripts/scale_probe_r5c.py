"""Round-5 batch-3 scale probe: heavy hitters and the Bloom-filtered
join at synthetic volume.

1. ``heavy_hitters`` at 40M rows with 2M distinct keys under Zipf-ish
   skew — the claim is zero full-cardinality shuffles: phase 1 is a
   scan, phase 2 shuffles candidates only.  Compared head-to-head with
   the naive ``groupBy.count().where()`` (which shuffles one row per
   DISTINCT key) for wall-clock and shuffle bytes.
2. ``bloom_filtered_join`` at 40M fact rows joining a 200k-key dim
   hitting ~1% of the fact — the regime where the dim is too big to
   WANT broadcast of the rows but the Bloom bit-set stays fixed-size.
   Measured against the plain shuffle join for wall-clock and shuffle
   bytes; result counts asserted equal.

Usage::

    PYTHONPATH=/root/repo python scripts/scale_probe_r5c.py

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

from scale_probe import ShuffleMeter, build_session  # noqa: E402


def probe_heavy_hitters(spark, meter) -> dict:
    from polars_grouper_spark.functions.heavy_hitters import heavy_hitters

    n_rows, n_hot = 40_000_000, 20
    # ~50% of rows spread over n_hot hot keys (each ~2.5% share), the
    # rest a 2M-key uniform tail.
    df = spark.range(n_rows).select(
        F.when(
            F.col("id") % 2 == 0, (F.col("id") % n_hot).cast("string")
        )
        .otherwise(
            F.concat(F.lit("tail_"), (F.xxhash64("id") % 2_000_000).cast("string"))
        )
        .alias("k")
    )
    (r0, w0) = meter.snapshot()
    t0 = time.time()
    hot = heavy_hitters(df, "k", 0.01).collect()
    dt = time.time() - t0
    (r1, w1) = meter.snapshot()
    sh_two_phase = (r1 - r0, w1 - w0)

    (r0, w0) = meter.snapshot()
    t0 = time.time()
    total = n_rows
    naive = (
        df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 0.01 * total)
        .collect()
    )
    dt_naive = time.time() - t0
    (r1, w1) = meter.snapshot()
    sh_naive = (r1 - r0, w1 - w0)

    assert {r["item"] for r in hot} == {r["k"] for r in naive}, "result mismatch"
    return {
        "probe": "heavy_hitters_40M_2Mkeys",
        "rows": n_rows,
        "hitters": len(hot),
        "two_phase_sec": round(dt, 1),
        "naive_sec": round(dt_naive, 1),
        "two_phase_shuffle_mb": round(sh_two_phase[1] / 1e6, 1),
        "naive_shuffle_mb": round(sh_naive[1] / 1e6, 1),
    }


def probe_bloom_join(spark, meter) -> dict:
    from polars_grouper_spark.plans.runtime_filter import bloom_filtered_join

    n_fact, n_dim, key_space = 40_000_000, 200_000, 20_000_000
    fact = spark.range(n_fact).select(
        (F.xxhash64("id") % key_space).alias("fk"), F.col("id").alias("payload")
    )
    dim = spark.range(n_dim).select(
        (F.col("id") * (key_space // n_dim)).alias("pk")
    )

    def timed(df):
        (r0, w0) = meter.snapshot()
        t0 = time.time()
        n = df.count()
        dt = time.time() - t0
        (r1, w1) = meter.snapshot()
        return n, round(dt, 1), round((w1 - w0) / 1e6, 1)

    # xxhash64 is the production hash; the md5 'portable' path exists
    # only for oracle parity and is measured to price that parity.
    n_fast, t_fast, sh_fast = timed(
        bloom_filtered_join(
            fact, dim, "fk", "pk", m_bits=21, how="left_semi", portable=False
        )
    )
    n_md5, t_md5, sh_md5 = timed(
        bloom_filtered_join(
            fact, dim, "fk", "pk", m_bits=21, how="left_semi", portable=True
        )
    )
    n_plain, t_plain, sh_plain = timed(
        fact.join(
            dim.withColumnRenamed("pk", "fk").hint("shuffle_hash"),
            "fk",
            "left_semi",
        )
    )
    assert n_fast == n_md5 == n_plain, (n_fast, n_md5, n_plain)
    return {
        "probe": "bloom_join_40M_fact_200k_dim",
        "fact_rows": n_fact,
        "dim_rows": n_dim,
        "matches": n_plain,
        "bloom_xxhash_sec": t_fast,
        "bloom_md5_sec": t_md5,
        "plain_shuffle_join_sec": t_plain,
        "bloom_shuffle_mb": sh_fast,
        "plain_shuffle_mb": sh_plain,
    }


def main():
    spark = build_session()
    meter = ShuffleMeter(spark)
    # warm the JVM/codegen paths so the first probe isn't billed startup
    spark.range(5_000_000).select(F.xxhash64("id").alias("h")).groupBy(
        F.pmod("h", F.lit(97))
    ).count().count()
    for probe in (probe_heavy_hitters, probe_bloom_join):
        print(json.dumps(probe(spark, meter)), flush=True)


if __name__ == "__main__":
    main()
