"""Rolling active-count sweep and feature hashing."""

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.features import feature_hashing
from polars_grouper_spark.operators.intervals import rolling_active_count


def _by_tick(df):
    return {
        r["tick"]: (r["active_now"], r["active_window"]) for r in df.collect()
    }


def test_basic_wau(spark):
    # u1 active days 1,2,10; u2 active day 2 only.  Window 7.
    act = spark.createDataFrame(
        [("u1", 1), ("u1", 2), ("u1", 10), ("u2", 2)], ["user", "day"]
    )
    out = _by_tick(rolling_active_count(act, "user", "day", 7))
    # day 1: u1 now; window {u1}.  day 2: both.  day 10: u1 (u2's day-2
    # activity expired at day 9; u1's day-2 activity expired too).
    assert out == {1: (1, 1), 2: (2, 2), 10: (1, 1)}


def test_window_expiry_boundary(spark):
    # window=3: activity at day 1 covers days 1,2,3 — visible at day 3,
    # gone at day 4.
    act = spark.createDataFrame(
        [("a", 1), ("b", 3), ("b", 4)], ["user", "day"]
    )
    out = _by_tick(rolling_active_count(act, "user", "day", 3))
    assert out == {1: (1, 1), 3: (1, 2), 4: (1, 1)}


def test_gap_equal_window_merges_runs(spark):
    # One user, activity at days 0 and 7, window 7: coverage [0,6] and
    # [7,13] are contiguous — the sweep must not double-count or leave a
    # hole at the seam (only ticks 0 and 7 are output days).
    act = spark.createDataFrame([("u", 0), ("u", 7)], ["user", "day"])
    out = _by_tick(rolling_active_count(act, "user", "day", 7))
    assert out == {0: (1, 1), 7: (1, 1)}


def test_duplicates_and_nulls_ignored(spark):
    act = spark.createDataFrame(
        [("u", 5), ("u", 5), (None, 5), ("v", None)], ["user", "day"]
    )
    out = _by_tick(rolling_active_count(act, "user", "day", 2))
    assert out == {5: (1, 1)}


def test_window_validation(spark):
    act = spark.createDataFrame([("u", 1)], ["user", "day"])
    with pytest.raises(ValueError):
        rolling_active_count(act, "user", "day", 0)


def test_matches_naive_range_join(spark):
    # Pseudo-random activity; compare the sweep against the naive
    # Spark-side range join + count distinct.
    act = spark.range(400).select(
        (F.col("id") % 23).alias("user"),
        F.pmod(F.col("id") * 37 + 11, F.lit(60)).alias("day"),
    )
    sweep = _by_tick(rolling_active_count(act, "user", "day", 7))
    da = act.select("user", "day").distinct()
    days = da.select(F.col("day").alias("d")).distinct()
    naive = (
        days.join(da, (F.col("day") >= F.col("d") - 6) & (F.col("day") <= F.col("d")))
        .groupBy("d")
        .agg(
            F.countDistinct(F.when(F.col("day") == F.col("d"), F.col("user"))).alias(
                "now"
            ),
            F.countDistinct("user").alias("win"),
        )
    )
    expect = {r["d"]: (r["now"], r["win"]) for r in naive.collect()}
    assert sweep == expect


def test_feature_hashing_shape_and_reconstruction(spark):
    docs = spark.createDataFrame(
        [(1, "red red blue"), (2, "blue green"), (3, None)], ["id", "txt"]
    )
    out = feature_hashing(docs, "id", "txt", n_features=64).collect()
    ids = {r["id"] for r in out}
    assert ids == {1, 2}
    # Total absolute weight per doc == token count when no collisions
    # (64 buckets, 3 tokens — collisions astronomically unlikely here,
    # and 'red red' lands in one bucket with |weight| 2).
    w1 = sorted(abs(r["weight"]) for r in out if r["id"] == 1)
    assert w1 == [1, 2]
    assert all(0 <= r["bucket"] < 64 for r in out)


def test_feature_hashing_case_insensitive_and_deterministic(spark):
    a = spark.createDataFrame([(1, "Alpha beta")], ["id", "txt"])
    b = spark.createDataFrame([(9, "alpha BETA")], ["id", "txt"])
    ra = {(r["bucket"], r["weight"]) for r in feature_hashing(a, "id", "txt").collect()}
    rb = {(r["bucket"], r["weight"]) for r in feature_hashing(b, "id", "txt").collect()}
    assert ra == rb


def test_feature_hashing_validation(spark):
    docs = spark.createDataFrame([(1, "x")], ["id", "txt"])
    with pytest.raises(ValueError):
        feature_hashing(docs, "id", "txt", n_features=1)
