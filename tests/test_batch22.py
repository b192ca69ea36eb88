"""Round-5 batch 22: deterministic RANSAC."""

from __future__ import annotations

import random

import pytest

from polars_grouper_spark.functions.regression import ransac_line


def test_ransac_ignores_outliers(spark):
    rng = random.Random(6)
    rows = []
    # 90% on y = 3x + 2 (tiny noise), 10% wild outliers
    for i in range(450):
        x = rng.randint(0, 100)
        rows.append((float(x), 3.0 * x + 2.0 + rng.randint(-5, 5) / 10.0, i))
    for i in range(450, 500):
        rows.append((float(rng.randint(0, 100)), float(rng.randint(500, 2000)), i))
    df = spark.createDataFrame(rows, ["x", "y", "id"])
    r = ransac_line(df, "x", "y", "id", n_candidates=16, eps=2.0).collect()[0]
    assert r.slope == pytest.approx(3.0, abs=0.2)
    assert r.intercept == pytest.approx(2.0, abs=10.0)
    assert r.inlier_frac > 0.75  # the structured 90%, minus noise band


def test_ransac_deterministic_across_partitionings(spark):
    rows = [(float(i), 2.0 * i, i) for i in range(200)]
    df = spark.createDataFrame(rows, ["x", "y", "id"])
    a = ransac_line(df, "x", "y", "id").collect()[0]
    b = ransac_line(df.repartition(13), "x", "y", "id").collect()[0]
    assert (a.cand_id, a.slope, a.intercept, a.n_inliers) == (
        b.cand_id, b.slope, b.intercept, b.n_inliers
    )
    assert a.n_inliers == 200  # perfect line: every point inlies


def test_ransac_degenerate_all_same_x_empty(spark):
    df = spark.createDataFrame(
        [(1.0, float(i), i) for i in range(40)], ["x", "y", "id"]
    )
    assert ransac_line(df, "x", "y", "id").count() == 0


def test_ransac_rejects_bad_params(spark):
    df = spark.createDataFrame([(1.0, 1.0, 1)], ["x", "y", "id"])
    with pytest.raises(ValueError):
        ransac_line(df, "x", "y", "id", n_candidates=0)
    with pytest.raises(ValueError):
        ransac_line(df, "x", "y", "id", eps=0.0)
