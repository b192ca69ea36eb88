"""Salting helpers: result parity with the unsalted plans on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_grouper_spark.plans.skew import salted_agg, salted_join


def _skewed(spark):
    # 10_000 rows on one hot key, a few cold keys.
    hot = spark.range(10_000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(50).select(
        F.concat(F.lit("c"), (F.col("id") % 5)).alias("k"), F.col("id").alias("v")
    )
    return hot.unionAll(cold)


def test_salted_agg_collect_list_parity(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: sorted(r["vs"])
        for r in df.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()
    }
    salted = salted_agg(
        df,
        ["k"],
        [F.collect_list("v").alias("vs_part")],
        lambda p: [F.flatten(F.collect_list("vs_part")).alias("vs")],
        n_salts=8,
    )
    got = {r["k"]: sorted(r["vs"]) for r in salted.collect()}
    assert got == plain


def test_salted_agg_count_distinct_parity(spark):
    df = _skewed(spark).withColumn("v", F.col("v") % 100)
    plain = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    salted = salted_agg(
        df,
        ["k"],
        [F.collect_set("v").alias("s_part")],
        lambda p: [
            F.size(F.array_distinct(F.flatten(F.collect_list("s_part")))).alias("n")
        ],
        n_salts=8,
    )
    got = {r["k"]: r["n"] for r in salted.collect()}
    assert got == plain


def test_salted_join_parity(spark):
    large = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1.0), ("c1", 2.0), ("c3", 3.0)], ["k", "w"]
    )
    plain = sorted(
        (r["k"], r["v"], r["w"]) for r in large.join(small, "k").collect()
    )
    got = sorted(
        (r["k"], r["v"], r["w"]) for r in salted_join(large, small, ["k"], 8).collect()
    )
    assert got == plain


def test_salted_join_left_keeps_unmatched(spark):
    large = _skewed(spark)
    small = spark.createDataFrame([("hot", 1.0)], ["k", "w"])
    out = salted_join(large, small, ["k"], 4, how="left")
    assert out.where(F.col("w").isNull()).count() == 50
    assert out.count() == large.count()
