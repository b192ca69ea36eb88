"""Personalized PageRank — teleport-to-sources semantics, dangling leak,
duplicate-edge weighting, python-simulator parity."""

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.operators.pagerank import personalized_page_rank


def simulate(edges, sources, d=0.85, iters=20):
    """Reference implementation: dict-based power iteration with the same
    semantics (duplicate rows weight edges, dangling mass leaks)."""
    nodes = sorted({x for e in edges for x in e})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    p = {v: (1 - d) / len(sources) if v in sources else 0.0 for v in nodes}
    r = {v: 1.0 / len(sources) if v in sources else 0.0 for v in nodes}
    for _ in range(iters):
        inc = {v: 0.0 for v in nodes}
        for u, v in edges:
            inc[v] += r[u] / outdeg[u]
        r = {v: p[v] + d * inc[v] for v in nodes}
    return r


def got(spark, edges, sources, iters=20):
    df = spark.createDataFrame(edges, ["from", "to"])
    out = personalized_page_rank(df, sources, max_iterations=iters)
    return {r["node"]: r["score"] for r in out.collect()}


def assert_close(a, b):
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12), k


def test_two_node_cycle_single_source(spark):
    edges = [("a", "b"), ("b", "a")]
    assert_close(got(spark, edges, ["a"]), simulate(edges, {"a"}))


def test_dangling_leak(spark):
    edges = [("a", "b")]
    assert_close(got(spark, edges, ["a"]), simulate(edges, {"a"}))


def test_multi_source_teleport(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    assert_close(got(spark, edges, ["a", "d"]), simulate(edges, {"a", "d"}))


def test_duplicate_edges_weight(spark):
    """Two copies of a->b double that edge's share of a's mass."""
    edges = [("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")]
    assert_close(got(spark, edges, ["a"]), simulate(edges, {"a"}))


def test_non_source_far_node_gets_mass_via_walk(spark):
    edges = [("s", "m"), ("m", "t"), ("t", "s")]
    scores = got(spark, edges, ["s"])
    assert scores["s"] > scores["m"] > scores["t"] * 0  # all positive
    assert all(v > 0 for v in scores.values())


def test_requires_sources(spark):
    df = spark.createDataFrame([("a", "b")], ["from", "to"])
    with pytest.raises(ValueError, match="source"):
        personalized_page_rank(df, [])
