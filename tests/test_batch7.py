"""Round-5 batch 7: TextRank, autocorrelation, eccentricity."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.text import textrank_edges, textrank_keywords
from polars_grouper_spark.functions.timeseries import acf


def test_textrank_hub_word_wins(spark):
    # 'hub' is adjacent to everything; spokes only touch the hub.
    docs = [(f"hub w{i} hub w{i} hub w{i}",) for i in range(5)]
    df = spark.createDataFrame(docs, ["text"])
    out = textrank_keywords(df, k=3, min_pair_count=3).collect()
    assert out[0].word == "hub"
    assert out[0].score > out[1].score


def test_textrank_min_pair_count_filters(spark):
    df = spark.createDataFrame(
        [("a b a b a b",), ("c d",)], ["text"]
    )  # (a,b) x3, (c,d) x1, (b,a) windows count too
    edges = textrank_edges(df, min_pair_count=3)
    nodes = {r.src for r in edges.collect()}
    assert "c" not in nodes and "d" not in nodes
    assert {"a", "b"} <= nodes


def test_textrank_lowercases_and_drops_self_pairs(spark):
    df = spark.createDataFrame([("Go go GO go",)], ["text"])
    # all tokens lowercase to 'go' -> only self-pairs -> empty graph
    assert textrank_edges(df, min_pair_count=1).count() == 0


def _brute_acf(series, max_lag):
    n = len(series)
    mean = sum(series) / n
    den = sum((x - mean) ** 2 for x in series)
    out = {}
    for lag in range(1, max_lag + 1):
        num = sum(
            (series[t] - mean) * (series[t + lag] - mean)
            for t in range(n - lag)
        )
        out[lag] = num / den
    return out


@pytest.mark.parametrize("seed", [1, 2])
def test_acf_matches_bruteforce_dense(spark, seed):
    rng = random.Random(seed)
    series = [rng.randint(0, 50) for _ in range(60)]
    df = spark.createDataFrame(list(enumerate(series)), ["t", "x"])
    got = {r.lag: r.acf for r in acf(df, "t", "x", max_lag=5).collect()}
    want = _brute_acf(series, 5)
    for lag in want:
        assert got[lag] == pytest.approx(want[lag], rel=1e-12), lag


def test_acf_periodic_series_spikes_at_period(spark):
    series = [10, 0] * 40
    df = spark.createDataFrame(list(enumerate(series)), ["t", "x"])
    got = {r.lag: r.acf for r in acf(df, "t", "x", max_lag=4).collect()}
    assert got[2] > 0.9 and got[4] > 0.9
    assert got[1] < -0.9 and got[3] < -0.9


def test_acf_sparse_ticks_pair_counts(spark):
    # missing tick 2: lag-1 pairs are (0,1) and (3,4) only
    df = spark.createDataFrame(
        [(0, 5), (1, 7), (3, 2), (4, 9)], ["t", "x"]
    )
    r = {x.lag: x for x in acf(df, "t", "x", max_lag=2).collect()}
    assert r[1].n_pairs == 2
    assert r[2].n_pairs == 1  # only (1 -> 3)


def test_acf_rejects_bad_lag(spark):
    df = spark.createDataFrame([(0, 1)], ["t", "x"])
    with pytest.raises(ValueError):
        acf(df, "t", "x", max_lag=0)


def test_eccentricity_on_path_graph(spark):
    # P0 - P30 - P60 - P90: ecc(P0)=3, ecc(P30)=2 (seeds: %30==0 <=600)
    from polars_grouper_spark.operators.shortest_path import (
        calculate_shortest_path,
    )

    edges = spark.createDataFrame(
        [("P0", "P30", 1.0), ("P30", "P60", 1.0), ("P60", "P90", 1.0)],
        ["src", "dst", "weight"],
    )
    sp = calculate_shortest_path(
        edges, "src", "dst", "weight", directed=False, sources=["P0", "P30"]
    )
    rows = sp.collect()
    ecc = {}
    for r in rows:
        for node in (r["from"], r["to"]):
            if node in ("P0", "P30"):
                ecc[node] = max(ecc.get(node, 0.0), r["distance"])
    assert ecc == {"P0": 3.0, "P30": 2.0}
