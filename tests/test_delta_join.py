"""Incremental join-view maintenance: the delta identity, exactly."""

from pyspark.sql import functions as F

from polars_grouper_spark.functions.incremental import delta_join


def _frames(spark):
    a = spark.createDataFrame(
        [(k, f"a{i}") for i, k in enumerate([1, 2, 2, 3, 5, 7])],
        "k long, pa string",
    )
    da = spark.createDataFrame([(2, "aX"), (8, "aY")], "k long, pa string")
    b = spark.createDataFrame(
        [(k, f"b{i}") for i, k in enumerate([2, 3, 3, 4, 8])],
        "k long, pb string",
    )
    db = spark.createDataFrame([(1, "bX"), (2, "bY")], "k long, pb string")
    return a, da, b, db


def test_delta_identity(spark):
    a, da, b, db = _frames(spark)
    full_new = a.unionByName(da).join(b.unionByName(db), "k")
    incremental = a.join(b, "k").unionByName(delta_join(a, da, b, db, ["k"]))
    assert sorted(map(tuple, full_new.collect())) == sorted(
        map(tuple, incremental.collect())
    )


def test_delta_join_empty_deltas_is_empty(spark):
    a, _, b, _ = _frames(spark)
    empty_a = a.where(F.lit(False))
    empty_b = b.where(F.lit(False))
    assert delta_join(a, empty_a, b, empty_b, ["k"]).count() == 0


def test_delta_join_multi_key(spark):
    a = spark.createDataFrame([(1, 10, "x"), (2, 20, "y")], "k1 long, k2 long, pa string")
    da = spark.createDataFrame([(1, 10, "z")], "k1 long, k2 long, pa string")
    b = spark.createDataFrame([(1, 10, "m"), (1, 99, "n")], "k1 long, k2 long, pb string")
    db = spark.createDataFrame([(2, 20, "o")], "k1 long, k2 long, pb string")
    full_new = a.unionByName(da).join(b.unionByName(db), ["k1", "k2"])
    inc = a.join(b, ["k1", "k2"]).unionByName(delta_join(a, da, b, db, ["k1", "k2"]))
    assert sorted(map(tuple, full_new.collect())) == sorted(map(tuple, inc.collect()))
