"""EWMA fold and stream-static enrichment."""

import time

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.timeseries import ewma
from polars_grouper_spark.streaming.enrich import enrich_stream


def test_ewma_hand_computed(spark):
    df = spark.createDataFrame(
        [("k", 1, 10.0), ("k", 2, 20.0), ("k", 3, 30.0)], ["key", "t", "v"]
    )
    out = {
        r["t"]: r["ewma"]
        for r in ewma(df, "key", ["t"], "v", alpha=0.5, lookback=50).collect()
    }
    # t=1: 10.  t=2: (10*.5+20)/(1+.5)=16.6667.  t=3: (10*.25+20*.5+30)/1.75
    assert out[1] == pytest.approx(10.0)
    assert out[2] == pytest.approx(25.0 / 1.5, abs=1e-6)
    assert out[3] == pytest.approx(42.5 / 1.75, abs=1e-6)


def test_ewma_lookback_one_is_identity(spark):
    df = spark.createDataFrame(
        [("k", i, float(i * 7 % 13)) for i in range(20)], ["key", "t", "v"]
    )
    out = ewma(df, "key", ["t"], "v", alpha=0.3, lookback=1)
    assert all(r["ewma"] == pytest.approx(r["v"]) for r in out.collect())


def test_ewma_null_rows_dropped_and_validation(spark):
    df = spark.createDataFrame(
        [("k", 1, 1.0), ("k", 2, None), (None, 3, 5.0)], ["key", "t", "v"]
    )
    assert ewma(df, "key", ["t"], "v").count() == 1
    with pytest.raises(ValueError):
        ewma(df, "key", ["t"], "v", alpha=1.0)
    with pytest.raises(ValueError):
        ewma(df, "key", ["t"], "v", lookback=0)


def test_ewma_per_key_isolation(spark):
    df = spark.createDataFrame(
        [("a", 1, 100.0), ("b", 1, 1.0), ("b", 2, 1.0)], ["key", "t", "v"]
    )
    out = {(r["key"], r["t"]): r["ewma"] for r in ewma(df, "key", ["t"], "v").collect()}
    assert out[("a", 1)] == pytest.approx(100.0)
    assert out[("b", 2)] == pytest.approx(1.0)


def test_enrich_batch_semantics(spark):
    ev = spark.createDataFrame([(1, "x"), (2, "y"), (9, "z")], ["uid", "ev"])
    dim = spark.createDataFrame(
        [(1, "gold", "junk1"), (2, "blue", "junk2")], ["uid", "seg", "junk"]
    )
    out = enrich_stream(ev, dim, "uid", how="left", dim_cols=["seg"])
    rows = {r["uid"]: (r["ev"], r["seg"]) for r in out.collect()}
    assert rows == {1: ("x", "gold"), 2: ("y", "blue"), 9: ("z", None)}
    assert "junk" not in out.columns


def test_enrich_broadcast_plan(spark):
    ev = spark.createDataFrame([(1, "x")], ["uid", "ev"])
    dim = spark.createDataFrame([(1, "gold")], ["uid", "seg"])
    plan = enrich_stream(ev, dim, "uid", how="inner")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_enrich_how_validation(spark):
    ev = spark.createDataFrame([(1, "x")], ["uid", "ev"])
    dim = spark.createDataFrame([(1, "g")], ["uid", "seg"])
    with pytest.raises(ValueError):
        enrich_stream(ev, dim, "uid", how="right")
    with pytest.raises(ValueError):
        enrich_stream(ev, dim, "uid", how="full")


def test_enrich_real_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (1, 30.0)], ["uid", "amount"]
    ).write.parquet(src)
    dim = spark.createDataFrame([(1, "gold"), (2, "blue")], ["uid", "seg"])
    stream = spark.readStream.schema("uid bigint, amount double").parquet(src)
    enriched = enrich_stream(stream, dim, "uid", how="inner")
    assert enriched.isStreaming
    agg = enriched.groupBy("seg").agg(F.sum("amount").alias("total"))
    name = f"enrich_sink_{int(time.time() * 1000)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["seg"]: r["total"] for r in spark.table(name).collect()}
    assert got == {"gold": 40.0, "blue": 20.0}
