"""Round-5 batch 3: correlation matrix, resample/ffill, balanced
sampling, Bloom-filtered join."""

import math

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.pca import correlation_matrix
from polars_grouper_spark.functions.sampling import balanced_sample
from polars_grouper_spark.functions.timeseries import resample_ffill
from polars_grouper_spark.plans.runtime_filter import bloom_filtered_join


# ---------------------------------------------------------------- corr
def test_correlation_matrix_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    x = rng.normal(size=(300, 3))
    x[:, 1] = 0.8 * x[:, 0] + 0.2 * x[:, 1]  # correlated pair
    df = spark.createDataFrame(
        [(row.tolist(),) for row in x], "v array<double>"
    )
    got = {
        (r["dim_i"], r["dim_j"]): r["corr"]
        for r in correlation_matrix(df, "v", quant=1000, decimals=9).collect()
    }
    # Reference over the SAME quantized integers the operator accumulates
    # (floor-truncation, the engine-wide quantization convention).
    ref = np.corrcoef(np.floor(x * 1000).T)
    assert len(got) == 6  # upper triangle of 3x3
    for (i, j), c in got.items():
        assert c == pytest.approx(ref[i, j], abs=1e-8)
    assert got[(0, 0)] == 1.0
    assert got[(0, 1)] > 0.9


def test_correlation_zero_variance_is_null(spark):
    df = spark.createDataFrame(
        [([1.0, 5.0],), ([2.0, 5.0],), ([3.0, 5.0],)], "v array<double>"
    )
    rows = {
        (r["dim_i"], r["dim_j"]): r["corr"]
        for r in correlation_matrix(df, "v").collect()
    }
    assert rows[(0, 1)] is None and rows[(1, 1)] is None
    assert rows[(0, 0)] == 1.0


# ------------------------------------------------------------ resample
def test_resample_ffill_fills_gaps(spark):
    rows = [
        (1, "2024-01-01 00:05:00", 10.0),
        (1, "2024-01-01 03:59:00", 40.0),  # gap of hours 1,2 -> carry 10
        (2, "2024-01-01 01:00:00", 7.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts string, v double").select(
        "k", F.to_timestamp("ts").alias("ts"), "v"
    )
    out = resample_ffill(df, "k", "ts", "v", step_s=3600)
    got = sorted((r["key"], r["bucket_epoch"], r["val"]) for r in out.collect())
    base = 1704067200  # 2024-01-01 00:00 UTC
    assert got == [
        (1, base, 10.0),
        (1, base + 3600, 10.0),
        (1, base + 7200, 10.0),
        (1, base + 10800, 40.0),
        (2, base + 3600, 7.0),
    ]


def test_resample_bucket_takes_latest_observation(spark):
    rows = [
        (1, "2024-01-01 00:10:00", 1.0),
        (1, "2024-01-01 00:50:00", 2.0),  # later in same bucket wins
    ]
    df = spark.createDataFrame(rows, "k long, ts string, v double").select(
        "k", F.to_timestamp("ts").alias("ts"), "v"
    )
    out = resample_ffill(df, "k", "ts", "v", step_s=3600).collect()
    assert len(out) == 1 and out[0]["val"] == 2.0


# ------------------------------------------------------------ balanced
def test_balanced_sample_equalizes_classes(spark):
    rows = [(i, "big") for i in range(90)] + [(100 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, cls string")
    out = balanced_sample(df, "cls", "doc_id")
    counts = {
        r["cls"]: r["n"]
        for r in out.groupBy("cls").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"big": 10, "small": 10}
    # deterministic: same salt -> same rows
    again = {r["doc_id"] for r in balanced_sample(df, "cls", "doc_id").collect()}
    assert {r["doc_id"] for r in out.collect()} == again


def test_balanced_sample_per_class_cap(spark):
    rows = [(i, "a") for i in range(20)] + [(50 + i, "b") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, cls string")
    out = balanced_sample(df, "cls", "doc_id", per_class=3)
    counts = {
        r["cls"]: r["n"]
        for r in out.groupBy("cls").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"a": 3, "b": 3}
    with pytest.raises(ValueError):
        balanced_sample(df, "cls", "doc_id", per_class=0)


# ----------------------------------------------------------- bloom join
def test_bloom_filtered_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(i, i % 50) for i in range(2000)], "row_id long, fk long"
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in (3, 17, 42)], "pk long, name string")
    got = bloom_filtered_join(fact, dim, "fk", "pk", m_bits=12).select(
        "row_id", "fk", "pk", "name"
    )
    plain = fact.join(dim, fact["fk"] == dim["pk"]).select("row_id", "fk", "pk", "name")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))
    assert got.count() == 3 * (2000 // 50)


def test_bloom_filtered_join_plan_is_broadcast_prefilter(spark):
    fact = spark.createDataFrame([(i, i % 10) for i in range(100)], "row_id long, fk long")
    dim = spark.createDataFrame([(2, "x")], "pk long, name string")
    plan = bloom_filtered_join(fact, dim, "fk", "pk", m_bits=10)._jdf.queryExecution().executedPlan().toString()
    # Small m: the packed bit-set rides as a dense array LITERAL, so the
    # probe is a pure filter expression in the fact's own stage — no
    # per-probe semi-join chain, no extra join of any kind.
    assert "LeftSemi" not in plan
    assert "shiftleft" in plan and "md5" in plan
    assert plan.count("Join") == 1  # only the re-check join itself
    # Big m: the nonzero words ride as a one-row broadcast map instead.
    plan_big = bloom_filtered_join(fact, dim, "fk", "pk", m_bits=24)._jdf.queryExecution().executedPlan().toString()
    assert "_bloom_bm" in plan_big and "BroadcastNestedLoopJoin" in plan_big
    assert "LeftSemi" not in plan_big


def test_bloom_filtered_join_rejects_outer(spark):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError):
        bloom_filtered_join(df, df, "a", "a", how="left")


def test_bloom_semi_join_mode(spark):
    fact = spark.createDataFrame([(i, i % 7) for i in range(70)], "row_id long, fk long")
    dim = spark.createDataFrame([(1,), (5,)], "pk long")
    got = bloom_filtered_join(fact, dim, "fk", "pk", how="left_semi", m_bits=10)
    assert got.count() == 20
    assert set(got.columns) == {"row_id", "fk"}
