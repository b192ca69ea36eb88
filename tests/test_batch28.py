"""Round-5 batch 28: reconciliation audit, key-consistent sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_order_total_audit_bands(spark):
    import __spark_entry__ as em

    rows = em.queries()["order_total_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    bands = {r.deviation_band: r.n_orders for r in rows}
    # inner-join semantics: only orders WITH lines are reconciled
    # (orders missing lines entirely are fk_audit's job)
    assert 0 < sum(bands.values()) <= 1500
    assert set(bands) <= {"<=1%", "<=10%", "<=50%", ">50%"}


def test_keysample_unbiased_and_join_consistent(spark):
    import __spark_entry__ as em

    r = em.queries()["keysample_revenue"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.true_revenue > 0
    # a 1/8 key sample scaled x8 should land within ~25% on this size
    assert r.rel_error < 0.25
    assert r.estimated_revenue == pytest.approx(
        r.true_revenue * (1 + r.rel_error), rel=1e-6
    ) or r.estimated_revenue == pytest.approx(
        r.true_revenue * (1 - r.rel_error), rel=1e-6
    )


def test_keysample_full_population_identity(spark):
    # sanity for the construction: summing ALL buckets scaled by 1
    # equals the true total (the estimator is exactly a partition)
    from polars_grouper_spark.functions.hashing import portable_hash64

    orders = spark.createDataFrame(
        [(i, i % 5) for i in range(100)], ["okey", "ckey"]
    )
    li = spark.createDataFrame(
        [(i, float(10 + i % 7)) for i in range(100)], ["okey", "amt"]
    )
    h = portable_hash64(F.concat(F.lit("ks|"), F.col("ckey").cast("string")))
    keyed = orders.select("okey", F.pmod(h, F.lit(8)).alias("b"))
    j = li.join(keyed, "okey")
    per_bucket = j.groupBy("b").agg(F.sum("amt").alias("s")).collect()
    assert sum(r.s for r in per_bucket) == pytest.approx(
        sum(10 + i % 7 for i in range(100))
    )
