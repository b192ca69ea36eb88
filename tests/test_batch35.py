"""Round-5 batch 35: 1-D earth-mover distance."""

from __future__ import annotations

import pytest

from polars_grouper_spark.functions.drift import emd_1d


def test_emd_identical_zero(spark):
    a = spark.range(1000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    r = emd_1d(a, a, "v", lo=0.0, hi=100.0, bins=100).collect()[0]
    assert r.emd == pytest.approx(0.0)


def test_emd_known_shift(spark):
    # mass at 10 vs mass at 30 with bin width 1: W1 = 20
    a = spark.range(500).selectExpr("10.0 AS v")
    b = spark.range(500).selectExpr("30.0 AS v")
    r = emd_1d(a, b, "v", lo=0.0, hi=100.0, bins=100).collect()[0]
    assert r.emd == pytest.approx(20.0, abs=1.0)  # within one bin width
    assert r.n_a == r.n_b == 500


def test_emd_order_sensitivity_vs_far_shift(spark):
    a = spark.range(400).selectExpr("10.0 AS v")
    near = spark.range(400).selectExpr("15.0 AS v")
    far = spark.range(400).selectExpr("90.0 AS v")
    e_near = emd_1d(a, near, "v", lo=0.0, hi=100.0, bins=100).collect()[0].emd
    e_far = emd_1d(a, far, "v", lo=0.0, hi=100.0, bins=100).collect()[0].emd
    assert e_far > e_near * 5  # EMD respects distance, unlike PSI


def test_emd_rejects_bad_range(spark):
    df = spark.range(1).selectExpr("1.0 AS v")
    with pytest.raises(ValueError):
        emd_1d(df, df, "v", lo=1.0, hi=1.0)
