"""Katz integer recursion vs in-memory replay; quantile-map identities."""

import pytest

from polars_grouper_spark.functions.features import quantile_map
from polars_grouper_spark.operators.katz import katz_centrality


def _brute_katz(edges, m, iters):
    nodes = {n for e in edges for n in e}
    y = {n: 1 for n in nodes}
    for t in range(1, iters + 1):
        nxt = {n: m**t for n in nodes}
        for u, v in set(edges):
            nxt[v] += y[u]
        y = nxt
    return {n: (y[n], y[n] / float(m**iters)) for n in nodes}


def test_katz_matches_replay(spark):
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "a"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: (r["raw"], r["katz"])
        for r in katz_centrality(df, "src", "dst", m=4, iters=4).collect()
    }
    assert got == _brute_katz(edges, 4, 4)


def test_katz_sink_only_gets_beta_terms(spark):
    # node with no in-edges: y_T = sum of m^t terms
    df = spark.createDataFrame([("x", "y")], "src string, dst string")
    got = {r["node"]: r["raw"] for r in
           katz_centrality(df, "src", "dst", m=3, iters=3).collect()}
    want = _brute_katz([("x", "y")], 3, 3)
    # x: no in-edges -> only the beta term of the LAST round, y_T = m^T
    assert got["x"] == 27 == want["x"][0]
    assert got["y"] == want["y"][0]


def test_quantile_map_identity_and_extremes(spark):
    src = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], "id long, v double"
    )
    # identical distributions -> identity map
    out = {r["id"]: r["mapped"] for r in quantile_map(src, src, "v", "id").collect()}
    assert out == {i: float(i) for i in range(1, 11)}
    # reference shifted by 100 -> mapped = value + 100
    ref = spark.createDataFrame(
        [(i, float(i + 100)) for i in range(1, 11)], "id long, v double"
    )
    out2 = {r["id"]: r["mapped"] for r in quantile_map(src, ref, "v", "id").collect()}
    assert out2 == {i: float(i + 100) for i in range(1, 11)}


def test_quantile_map_different_sizes(spark):
    # 4 source rows onto a 2-value reference: lower half -> lo, upper -> hi
    src = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)], "id long, v double"
    )
    ref = spark.createDataFrame([(9, 0.0), (8, 1.0)], "id long, v double")
    out = {r["id"]: r["mapped"] for r in quantile_map(src, ref, "v", "id").collect()}
    assert out == {1: 0.0, 2: 0.0, 3: 1.0, 4: 1.0}


def test_quantile_map_empty_raises(spark):
    src = spark.createDataFrame([(1, 1.0)], "id long, v double")
    empty = src.where("id < 0")
    with pytest.raises(ValueError, match="empty"):
        quantile_map(src, empty, "v", "id")
    with pytest.raises(ValueError, match="empty"):
        quantile_map(empty, src, "v", "id")


def test_katz_local_and_distributed_tiers_identical(spark):
    from polars_grouper_spark.operators.katz import katz_centrality

    edges = spark.createDataFrame(
        [(f"k{(3 * i) % 11}", f"k{(7 * i + 1) % 11}") for i in range(25)],
        ["from", "to"],
    )
    loc = sorted(tuple(r) for r in katz_centrality(edges).collect())
    dist = sorted(
        tuple(r)
        for r in katz_centrality(edges, max_local_edges=0).collect()
    )
    assert loc == dist
