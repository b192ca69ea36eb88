"""Mergeable partial-aggregate state (functions/incremental.py)."""

from pyspark.sql import functions as F

from polars_grouper_spark.functions.incremental import (
    agg_state,
    finalize_state,
    merge_agg_state,
)
from polars_grouper_spark.sources import load_table


def test_batches_compose(spark):
    """state(A u B) == merge(state(A), state(B)) — yesterday's state plus
    today's batch equals recomputing from scratch."""
    o = load_table(spark, "orders", "/root/testdata/sf0.001").select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderkey").alias("k"),
    )
    half_a = o.where("k % 2 = 0")
    half_b = o.where("k % 2 = 1")
    merged = merge_agg_state(
        agg_state(half_a, ["priority"], "cents").union(
            agg_state(half_b, ["priority"], "cents")
        ),
        ["priority"],
    )
    direct = agg_state(o, ["priority"], "cents")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_merge_is_order_independent(spark):
    rows = [("a", 5), ("a", 7), ("b", 100), ("a", 1), ("b", -3)]
    df = spark.createDataFrame(rows, "g string, v long")
    states = [
        agg_state(df.where(f"v = {v}"), ["g"], "v")
        for _, v in rows
    ]
    fwd = states[0]
    for s in states[1:]:
        fwd = merge_agg_state(fwd.union(s), ["g"])
    rev = states[-1]
    for s in reversed(states[:-1]):
        rev = merge_agg_state(rev.union(s), ["g"])
    assert sorted(map(tuple, fwd.collect())) == sorted(map(tuple, rev.collect()))
    got = {r["g"]: (r["n"], r["sum_q"], r["min_q"], r["max_q"]) for r in fwd.collect()}
    assert got == {"a": (3, 13, 1, 7), "b": (2, 97, -3, 100)}


def test_finalize_units_and_mean(spark):
    df = spark.createDataFrame([("x", 150), ("x", 250)], "g string, cents long")
    out = finalize_state(
        agg_state(df, ["g"], "cents"), scale=100.0, mean_decimals=4
    ).collect()[0]
    assert (out["sum_v"], out["min_v"], out["max_v"], out["mean_v"]) == (
        4.0, 1.5, 2.5, 2.0,
    )


def test_null_values_drop(spark):
    df = spark.createDataFrame(
        [("g", 5), ("g", None)], "g string, v long"
    )
    out = agg_state(df, ["g"], "v").collect()[0]
    assert (out["n"], out["sum_q"]) == (1, 5)
