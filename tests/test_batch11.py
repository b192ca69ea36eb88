"""Round-5 batch 11: HLL intersection, partitioned roundtrip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.sketches import hll_intersect


def test_hll_intersect_disjoint_near_zero(spark):
    a = spark.range(0, 2000).select(F.concat(F.lit("a"), "id").alias("k"))
    b = spark.range(0, 2000).select(F.concat(F.lit("b"), "id").alias("k"))
    r = hll_intersect(a, "k", b, "k", b=12).collect()[0]
    assert r.est_a == pytest.approx(2000, rel=0.05)
    assert r.est_b == pytest.approx(2000, rel=0.05)
    assert r.est_union == pytest.approx(4000, rel=0.05)
    assert abs(r.est_intersect) < 0.05 * 4000


def test_hll_intersect_half_overlap(spark):
    a = spark.range(0, 4000).select(F.col("id").cast("string").alias("k"))
    b = spark.range(2000, 6000).select(F.col("id").cast("string").alias("k"))
    r = hll_intersect(a, "k", b, "k", b=12).collect()[0]
    assert r.est_union == pytest.approx(6000, rel=0.05)
    assert r.est_intersect == pytest.approx(2000, rel=0.20)
    # inclusion-exclusion identity holds exactly on the rounded parts
    assert r.est_intersect == pytest.approx(
        round(r.est_a + r.est_b - r.est_union, 4), abs=1e-9
    )


def test_hll_intersect_identical_sets(spark):
    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("k"))
    r = hll_intersect(a, "k", a, "k", b=12).collect()[0]
    # A == B: union estimate equals each side bit for bit, so
    # intersect == est_a exactly (same registers, same estimate).
    assert r.est_a == r.est_b == r.est_union
    assert r.est_intersect == pytest.approx(r.est_a, abs=1e-9)


def test_partitioned_roundtrip_prunes_and_preserves(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10.0, "A B"), (2, 20.0, "A B"), (3, 30.0, "C")],
        ["k", "v", "p"],
    )
    path = str(tmp_path / "part")
    df.write.mode("overwrite").partitionBy("p").parquet(path)
    back = spark.read.parquet(path).where(F.col("p") == "A B")
    rows = back.orderBy("k").collect()
    # space-escaped partition value round-trips; only that dir is read
    assert [(r.k, r.v, r.p) for r in rows] == [(1, 10.0, "A B"), (2, 20.0, "A B")]
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
