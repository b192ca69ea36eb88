"""Round-5 batch 25: McNemar, median-of-means."""

from __future__ import annotations

import random

import pytest

from polars_grouper_spark.functions.experiment import (
    mcnemar_test,
    median_of_means,
)


def test_mcnemar_bruteforce(spark):
    rows = [
        (True, True, True),    # both right
        (True, False, True),   # b wrong -> n10
        (False, True, True),   # a wrong -> n01
        (False, True, True),   # n01
        (False, False, True),  # both wrong
    ]
    df = spark.createDataFrame(rows, ["pa", "pb", "y"])
    r = mcnemar_test(df, "pa", "pb", "y").collect()[0]
    assert (r.n01, r.n10) == (2, 1)
    assert r.chi2 == pytest.approx((abs(2 - 1) - 1) ** 2 / 3)


def test_mcnemar_no_discordance_null(spark):
    df = spark.createDataFrame(
        [(True, True, True), (False, False, True)], ["pa", "pb", "y"]
    )
    assert mcnemar_test(df, "pa", "pb", "y").collect()[0].chi2 is None


def test_mom_resists_outliers(spark):
    rng = random.Random(8)
    rows = [(i, 100.0 + rng.randint(-10, 10)) for i in range(2000)]
    rows += [(10_000 + i, 1e7) for i in range(5)]  # extreme garbage
    df = spark.createDataFrame(rows, ["id", "v"])
    r = median_of_means(df, "v", "id", n_buckets=32).collect()[0]
    plain_mean = sum(v for _, v in rows) / len(rows)
    assert plain_mean > 20000          # the mean is wrecked
    assert 90 < r.mom < 3500           # MoM stays near the bulk
    assert r.n == 2005 and r.n_buckets == 32


def test_mom_deterministic_across_partitionings(spark):
    rows = [(i, float(i % 97)) for i in range(1000)]
    df = spark.createDataFrame(rows, ["id", "v"])
    a = median_of_means(df, "v", "id").collect()[0]
    b = median_of_means(df.repartition(11), "v", "id").collect()[0]
    assert a.mom == b.mom


def test_mom_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 1.0)], ["id", "v"])
    with pytest.raises(ValueError):
        median_of_means(df, "v", "id", n_buckets=0)
