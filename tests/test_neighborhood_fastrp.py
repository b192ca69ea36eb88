"""HLL ball sizes (HyperANF primitive) and FastRP embeddings."""

import hashlib

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.operators.fastrp import fastrp_embedding
from polars_grouper_spark.operators.neighborhood import hll_ball_size

PATH = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]


def _est(df):
    return {r["node"]: r["estimate"] for r in df.collect()}


def test_ball_radius0_is_one(spark):
    edges = spark.createDataFrame(PATH, ["from", "to"])
    est = _est(hll_ball_size(edges, "from", "to", radius=0, b=8))
    assert set(est) == {"a", "b", "c", "d", "e"}
    for v in est.values():
        assert 0.9 <= v <= 1.1


def test_ball_radius1_path(spark):
    edges = spark.createDataFrame(PATH, ["from", "to"])
    est = _est(hll_ball_size(edges, "from", "to", radius=1, b=8))
    exact = {"a": 2, "b": 3, "c": 3, "d": 3, "e": 2}
    for n, x in exact.items():
        assert abs(est[n] - x) / x < 0.1, (n, est[n], x)


def test_ball_radius2_path(spark):
    edges = spark.createDataFrame(PATH, ["from", "to"])
    est = _est(hll_ball_size(edges, "from", "to", radius=2, b=8))
    exact = {"a": 3, "b": 4, "c": 5, "d": 4, "e": 3}
    for n, x in exact.items():
        assert abs(est[n] - x) / x < 0.1, (n, est[n], x)


def test_ball_directed(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["from", "to"])
    est = _est(hll_ball_size(edges, "from", "to", radius=2, b=8, directed=True))
    # a reaches {a,b,c}, b reaches {b,c}, c only itself.
    assert est["a"] > est["b"] > est["c"]


def test_ball_validation(spark):
    edges = spark.createDataFrame(PATH, ["from", "to"])
    with pytest.raises(ValueError):
        hll_ball_size(edges, "from", "to", radius=-1)
    with pytest.raises(ValueError):
        hll_ball_size(edges, "from", "to", b=3)


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _brute_fastrp(edge_list, dim=8, sparsity=3, weights=(1, 1)):
    """Pure-Python replay: undirected, unnormalized two-level FastRP."""
    adj = {}
    es = set()
    for u, v in edge_list:
        if u == v:
            continue
        es.add((u, v))
        es.add((v, u))
    for u, v in es:
        adj.setdefault(u, set()).add(v)
    nodes = sorted(adj)

    def r(node, d):
        h = _hash60(f"{node}#{d}") % (2 * sparsity)
        return 1 if h == 0 else (-1 if h == 1 else 0)

    lvl1 = {
        (v, d): sum(r(u, d) for u in adj[v]) for v in nodes for d in range(dim)
    }
    lvl2 = {
        (v, d): sum(lvl1[(u, d)] for u in adj[v])
        for v in nodes
        for d in range(dim)
    }
    out = {}
    w1, w2 = weights
    for v in nodes:
        for d in range(dim):
            has1 = any(r(u, d) != 0 for u in adj[v])
            has2 = any(
                any(r(w, d) != 0 for w in adj[u]) for u in adj[v]
            )
            if has1 or has2:
                out[(v, d)] = w1 * lvl1[(v, d)] + w2 * lvl2[(v, d)]
    return out


def test_fastrp_matches_brute_force(spark):
    edge_list = [(f"n{i % 11}", f"n{(i * 3 + 1) % 11}") for i in range(25)]
    edges = spark.createDataFrame(edge_list, ["from", "to"])
    got = {
        (r["node"], r["dim"]): r["val"]
        for r in fastrp_embedding(edges, "from", "to", dim=8).collect()
    }
    want = _brute_fastrp(edge_list, dim=8)
    assert got == want


def test_fastrp_deterministic_under_repartition(spark):
    edge_list = [(i % 13, (i * 5 + 2) % 13) for i in range(40)]
    edges = spark.createDataFrame(edge_list, ["from", "to"])
    a = {
        (r["node"], r["dim"]): r["val"]
        for r in fastrp_embedding(edges, "from", "to", dim=8).collect()
    }
    b = {
        (r["node"], r["dim"]): r["val"]
        for r in fastrp_embedding(
            edges.repartition(7), "from", "to", dim=8
        ).collect()
    }
    assert a == b


def test_fastrp_validation(spark):
    edges = spark.createDataFrame(PATH, ["from", "to"])
    with pytest.raises(ValueError):
        fastrp_embedding(edges, "from", "to", dim=0)
    with pytest.raises(ValueError):
        fastrp_embedding(edges, "from", "to", sparsity=0)


def test_fastrp_local_tier_matches_distributed(spark):
    """r9-opt parity: the guarded driver-local tier (default here — the
    graph is tiny) must be frame-identical to the distributed wide-join
    path (forced via max_local_edges=0), for both directed and
    undirected closures."""
    edge_list = [(f"n{i % 11}", f"n{(i * 3 + 1) % 11}") for i in range(25)]
    edges = spark.createDataFrame(edge_list, ["from", "to"])
    for directed in (False, True):
        local = {
            (r["node"], r["dim"]): r["val"]
            for r in fastrp_embedding(
                edges, "from", "to", dim=8, directed=directed
            ).collect()
        }
        dist = {
            (r["node"], r["dim"]): r["val"]
            for r in fastrp_embedding(
                edges, "from", "to", dim=8, directed=directed,
                max_local_edges=0,
            ).collect()
        }
        assert local == dist


def test_fastrp_distributed_small_broadcast_guard(spark):
    """Above-guard distributed path (max_broadcast_nodes=0 → shuffle
    joins) is value-identical too."""
    edge_list = [(i % 13, (i * 5 + 2) % 13) for i in range(40)]
    edges = spark.createDataFrame(edge_list, ["from", "to"])
    a = {
        (r["node"], r["dim"]): r["val"]
        for r in fastrp_embedding(
            edges, "from", "to", dim=8, max_local_edges=0
        ).collect()
    }
    b = {
        (r["node"], r["dim"]): r["val"]
        for r in fastrp_embedding(
            edges, "from", "to", dim=8, max_local_edges=0,
            max_broadcast_nodes=0,
        ).collect()
    }
    assert a == b
