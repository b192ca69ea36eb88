"""Round-5 batch 13: CUPED, Matryoshka energy."""

from __future__ import annotations

import random

import pytest

from polars_grouper_spark.functions.experiment import cuped_adjust
from polars_grouper_spark.functions.similarity import matryoshka_energy


def test_cuped_matches_bruteforce(spark):
    rng = random.Random(11)
    rows = []
    for _ in range(200):
        x = rng.randint(0, 100) / 2.0
        y = 0.8 * x + rng.randint(0, 40) / 2.0  # correlated pre/post
        rows.append((x, y))
    df = spark.createDataFrame(rows, ["pre", "post"])
    r = cuped_adjust(df, "pre", "post", quant=100).collect()[0]
    n = len(rows)
    sx = sum(x for x, _ in rows); sy = sum(y for _, y in rows)
    var_x = sum((x - sx / n) ** 2 for x, _ in rows) / (n - 1)
    var_y = sum((y - sy / n) ** 2 for _, y in rows) / (n - 1)
    cov = sum((x - sx / n) * (y - sy / n) for x, y in rows) / (n - 1)
    assert r.theta == pytest.approx(cov / var_x, abs=2e-5)
    assert r.var_y == pytest.approx(var_y, rel=1e-4)
    assert r.var_y_adj == pytest.approx(var_y - cov**2 / var_x, rel=1e-3)
    # strong pre/post correlation -> big variance reduction
    assert r.var_reduction_pct > 50


def test_cuped_uncorrelated_near_zero_reduction(spark):
    rng = random.Random(12)
    rows = [
        (rng.randint(0, 100) / 2.0, rng.randint(0, 100) / 2.0)
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, ["pre", "post"])
    r = cuped_adjust(df, "pre", "post").collect()[0]
    assert r.var_reduction_pct < 5


def test_cuped_degenerate_constant_pre(spark):
    df = spark.createDataFrame([(1.0, 2.0), (1.0, 3.0)], ["pre", "post"])
    r = cuped_adjust(df, "pre", "post").collect()[0]
    assert r.theta is None and r.var_y_adj is None


def test_matryoshka_energy_monotone_and_exact(spark):
    # vectors with all mass in the first 2 dims
    rows = [([3.0, 4.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],) for _ in range(10)]
    df = spark.createDataFrame(rows, ["embedding"])
    out = {r.d: r.energy for r in
           matryoshka_energy(df, dims=(1, 2, 4, 8)).collect()}
    assert out[2] == pytest.approx(1.0)
    assert out[8] == pytest.approx(1.0)
    assert out[1] == pytest.approx(9.0 / 25.0)
    assert out[1] <= out[2] <= out[4] <= out[8]


def test_matryoshka_rejects_bad_dims(spark):
    df = spark.createDataFrame([([1.0],)], ["embedding"])
    with pytest.raises(ValueError):
        matryoshka_energy(df, dims=())
