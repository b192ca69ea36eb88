"""Round-5 batch 24: adjusted Rand, WAPE backtest."""

from __future__ import annotations

import pytest

from polars_grouper_spark.functions.evaluation import adjusted_rand
from polars_grouper_spark.functions.timeseries import wape_backtest


def test_ari_identical_partitions(spark):
    rows = [(f"c{i % 3}", f"k{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, ["a", "b"])
    r = adjusted_rand(df, "a", "b").collect()[0]
    assert r.rand_index == pytest.approx(1.0)
    assert r.ari == pytest.approx(1.0)


def test_ari_independent_partitions_near_zero(spark):
    # a depends on i%4, b on i//25: independent-ish grid
    rows = [(f"c{i % 4}", f"k{i // 25}") for i in range(100)]
    df = spark.createDataFrame(rows, ["a", "b"])
    r = adjusted_rand(df, "a", "b").collect()[0]
    assert abs(r.ari) < 0.05


def test_ari_matches_sklearn_formula_bruteforce(spark):
    import itertools

    rows = [("x", "p"), ("x", "p"), ("x", "q"), ("y", "q"), ("y", "q"),
            ("y", "p"), ("x", "p")]
    df = spark.createDataFrame(rows, ["a", "b"])
    r = adjusted_rand(df, "a", "b").collect()[0]
    # brute force over pairs
    n = len(rows)
    same_a = same_b = both = 0
    for (a1, b1), (a2, b2) in itertools.combinations(rows, 2):
        sa, sb = a1 == a2, b1 == b2
        same_a += sa; same_b += sb; both += sa and sb
    npairs = n * (n - 1) / 2
    expected = same_a * same_b / npairs
    ari = (both - expected) / ((same_a + same_b) / 2 - expected)
    rand = (npairs + 2 * both - same_a - same_b) / npairs
    assert r.ari == pytest.approx(ari, rel=1e-12)
    assert r.rand_index == pytest.approx(rand, rel=1e-12)


def test_wape_perfect_weekly_cycle_zero(spark):
    series = [(t, 10 + (t % 7)) for t in range(28)]
    df = spark.createDataFrame(series, ["t", "x"])
    r = wape_backtest(df, "t", "x", lag=7).collect()[0]
    assert r.n_days == 21 and r.wape == pytest.approx(0.0)


def test_wape_bruteforce(spark):
    series = [(0, 10), (1, 20), (7, 14), (8, 15), (9, 7)]
    df = spark.createDataFrame(series, ["t", "x"])
    r = wape_backtest(df, "t", "x", lag=7).collect()[0]
    # pairs: t=7 (f=10), t=8 (f=20); t=9 has no t=2 -> drops
    assert r.n_days == 2
    assert r.sum_abs_err == abs(14 - 10) + abs(15 - 20)
    assert r.wape == pytest.approx(9 / 29)


def test_wape_rejects_bad_lag(spark):
    df = spark.createDataFrame([(0, 1)], ["t", "x"])
    with pytest.raises(ValueError):
        wape_backtest(df, "t", "x", lag=0)
