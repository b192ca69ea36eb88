"""Round-5 batch 14: RFM segmentation, vocabulary growth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.features import rfm_segments
from polars_grouper_spark.functions.text import vocab_growth


def test_rfm_best_and_worst_customers(spark):
    rows = []
    # 10 customers: custkey i has i orders of amount 10*i, latest ts i
    for c in range(1, 11):
        for j in range(c):
            rows.append((c, float(86400 * c + j), 10.0 * c))
    df = spark.createDataFrame(rows, ["key", "t", "amount"]).select(
        "key", F.col("t").cast("timestamp").alias("ts"), "amount"
    )
    out = {r.key: r for r in rfm_segments(df, "key", "ts", "amount").collect()}
    assert out[10].segment == "555"  # newest, most frequent, biggest
    assert out[1].segment == "111"
    assert out[10].frequency == 10
    assert out[10].monetary == pytest.approx(1000.0)


def test_rfm_deterministic_ties(spark):
    # identical metrics: tiles split by key deterministically
    rows = [(k, 86400.0, 5.0) for k in range(1, 5)]
    df = spark.createDataFrame(rows, ["key", "t", "amount"]).select(
        "key", F.col("t").cast("timestamp").alias("ts"), "amount"
    )
    out = {r.key: r.r for r in
           rfm_segments(df, "key", "ts", "amount", n_tiles=2).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 2}


def test_vocab_growth_monotone_and_exact(spark):
    docs = [
        (1, "a b c"),       # vocab {a,b,c}, 3 tokens
        (2, "a b d"),       # +d -> 4
        (3, "a a a"),       # +0 -> 4
        (4, "e f"),         # +2 -> 6
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.checkpoint: r for r in
           vocab_growth(df, n_checkpoints=3).collect()}
    # thresholds: lo=1, hi=4 -> 1+floor(3i/3): 2, 3, 4
    assert out[1].id_threshold == 2 and out[1].vocab == 4
    assert out[1].n_tokens == 6
    assert out[2].id_threshold == 3 and out[2].vocab == 4
    assert out[2].n_tokens == 9
    assert out[3].id_threshold == 4 and out[3].vocab == 6
    assert out[3].n_tokens == 11
    ck = sorted(out)
    assert all(out[a].vocab <= out[b].vocab for a, b in zip(ck, ck[1:]))


def test_vocab_growth_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        vocab_growth(df, n_checkpoints=1)
