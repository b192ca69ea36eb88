"""Round-5 batch 21: binary-segmentation mean split."""

from __future__ import annotations

import random

import pytest

from polars_grouper_spark.operators.changepoint import best_mean_split


def test_mean_split_finds_planted_break(spark):
    # level shift at t=50: mean 10 -> mean 40
    rng = random.Random(2)
    series = [(t, 10 + rng.randint(-2, 2)) for t in range(50)] + [
        (t, 40 + rng.randint(-2, 2)) for t in range(50, 100)
    ]
    df = spark.createDataFrame(series, ["t", "x"])
    r = best_mean_split(df, "t", "x").collect()[0]
    assert r.split_t == 49  # last tick of the left segment
    assert r.n_before == 50 and r.n_after == 50
    assert r.mean_before == pytest.approx(10, abs=1)
    assert r.mean_after == pytest.approx(40, abs=1)


def test_mean_split_bruteforce_gain(spark):
    series = [(0, 1), (1, 1), (2, 9), (3, 9)]
    df = spark.createDataFrame(series, ["t", "x"])
    r = best_mean_split(df, "t", "x").collect()[0]
    xs = [x for _, x in series]
    s, n = sum(xs), len(xs)
    best = None
    for k in range(1, n):
        s1 = sum(xs[:k])
        g = s1 * s1 / k + (s - s1) ** 2 / (n - k) - s * s / n
        if best is None or g > best[1]:
            best = (k - 1, g)
    assert r.split_t == best[0]
    assert r.gain == pytest.approx(best[1], rel=1e-12)


def test_mean_split_constant_series_ties_to_earliest(spark):
    df = spark.createDataFrame([(t, 5) for t in range(6)], ["t", "x"])
    r = best_mean_split(df, "t", "x").collect()[0]
    assert r.split_t == 0 and r.gain == pytest.approx(0.0)


def test_mean_split_single_tick_empty(spark):
    df = spark.createDataFrame([(0, 5)], ["t", "x"])
    assert best_mean_split(df, "t", "x").count() == 0
