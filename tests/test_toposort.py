"""Topological levels (Kahn peeling)."""

import pytest

from polars_grouper_spark.operators.toposort import topological_levels


def _lv(df):
    return {r["node"]: r["level"] for r in df.collect()}


def test_diamond(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")], ["from", "to"]
    )
    assert _lv(topological_levels(edges)) == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_longest_path_not_shortest(spark):
    # d is reachable in 1 hop from a but also via a->b->c->d: level 3.
    edges = spark.createDataFrame(
        [("a", "d"), ("a", "b"), ("b", "c"), ("c", "d")], ["from", "to"]
    )
    assert _lv(topological_levels(edges))["d"] == 3


def test_cycle_raises(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["from", "to"]
    )
    with pytest.raises(ValueError, match="cycle"):
        topological_levels(edges)


def test_self_loop_raises(spark):
    edges = spark.createDataFrame([("a", "a"), ("a", "b")], ["from", "to"])
    with pytest.raises(ValueError, match="cycle"):
        topological_levels(edges)


def test_distributed_path_matches_local(spark):
    # max_local_edges=0 forces the distributed block peel; same answers.
    edges = spark.createDataFrame(
        [("a", "d"), ("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        ["from", "to"],
    )
    want = _lv(topological_levels(edges))
    got = _lv(topological_levels(edges, max_local_edges=0, block=2))
    assert got == want == {"a": 0, "b": 1, "x": 0, "y": 1, "c": 2, "d": 3}


def test_distributed_path_cycle_raises(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], ["from", "to"]
    )
    with pytest.raises(ValueError, match="cycle"):
        topological_levels(edges, max_local_edges=0, block=3)


def test_composes_with_condensation(spark):
    from polars_grouper_spark.operators.scc import condensation

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"), ("d", "c"), ("d", "e")],
        ["from", "to"],
    )
    dag = condensation(edges)
    assert _lv(topological_levels(dag, "src_scc", "dst_scc")) == {
        "a": 0,
        "c": 1,
        "e": 2,
    }
