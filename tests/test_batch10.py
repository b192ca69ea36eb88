"""Round-5 batch 10: streaming quarantine, rich-club, Zipf."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.text import zipf_alpha
from polars_grouper_spark.operators.degree_stats import rich_club


def test_rich_club_complete_core(spark):
    # K4 core (a,b,c,d all degree >= 3) plus pendant nodes on 'a'
    core = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    pendants = [("a", f"p{i}") for i in range(5)]
    df = spark.createDataFrame(core + pendants, ["from", "to"])
    out = {r.k: r for r in rich_club(df, ks=(1, 2, 3)).collect()}
    # degree: a=8, b=c=d=3, pendants=1
    assert out[2].n_nodes == 4 and out[2].n_edges == 6
    assert out[2].phi == pytest.approx(1.0)  # the K4 is a perfect club
    assert out[1].n_nodes == 4 and out[1].phi == pytest.approx(1.0)
    # k=3: only 'a' qualifies -> phi NULL (fewer than 2 nodes)
    assert out[3].n_nodes == 1 and out[3].n_edges == 0 and out[3].phi is None


def test_rich_club_dedups_and_canonicalizes(spark):
    # triangle with duplicate/reversed/self edges: every degree is 2
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "b"), ("a", "a"), ("b", "c"), ("c", "a")],
        ["from", "to"],
    )
    out = {r.k: r for r in rich_club(df, ks=(1, 2)).collect()}
    assert out[1].n_nodes == 3 and out[1].n_edges == 3
    assert out[1].phi == pytest.approx(1.0)
    assert out[2].n_nodes == 0 and out[2].phi is None


def test_rich_club_rejects_bad_ks(spark):
    df = spark.createDataFrame([("a", "b")], ["from", "to"])
    with pytest.raises(ValueError):
        rich_club(df, ks=())
    with pytest.raises(ValueError):
        rich_club(df, ks=(0, -1))


def test_zipf_alpha_bruteforce(spark):
    # counts: 'w0' x8, 'w1' x4, 'w2' x2, rare singles
    text = " ".join(["w0"] * 8 + ["w1"] * 4 + ["w2"] * 2 + ["r1", "r2"])
    df = spark.createDataFrame([(text,)], ["text"])
    r = zipf_alpha(df, "text", c_min=2).collect()[0]
    assert r.n_tokens == 5 and r.n_tail == 3 and r.max_count == 8
    denom = sum(math.log(c / 1.5) for c in (8, 4, 2))
    assert r.alpha == pytest.approx(round(1.0 + 3 / denom, 6), abs=2e-6)


def test_zipf_lowercases(spark):
    df = spark.createDataFrame([("A a A a",)], ["text"])
    r = zipf_alpha(df, "text", c_min=1).collect()[0]
    assert r.n_tokens == 1 and r.max_count == 4


def test_quarantine_on_stream_matches_batch(spark, tmp_path):
    from polars_grouper_spark.functions.validate import quarantine

    rows = [(i, float(v), t) for i, (v, t) in enumerate(
        [(500, "ok"), (10, "error"), (20, "ok"), (900, "error")]
    )]
    df = spark.createDataFrame(rows, "event_id long, value double, event_type string")
    rules = [
        ("error_event", F.col("event_type") == "error"),
        ("high_value", F.col("value") > 400),
    ]
    batch = {r.id: r.reasons for r in quarantine(df, rules, "event_id").collect()}
    p = str(tmp_path / "in")
    df.write.parquet(p)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(p)
    )
    q = (
        quarantine(stream, rules, "event_id")
        .writeStream.format("memory")
        .queryName("t_sq_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.id: r.reasons for r in spark.table("t_sq_sink").collect()}
    spark.catalog.dropTempView("t_sq_sink")
    assert got == batch == {0: "high_value", 1: "error_event", 3: "error_event,high_value"}
