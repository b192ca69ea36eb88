"""Degree distribution and power-law MLE."""

import pytest

from polars_grouper_spark.operators.degree_stats import (
    degree_distribution,
    powerlaw_alpha,
    powerlaw_alpha_exact,
)


def test_star_distribution(spark):
    edges = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(5)], ["from", "to"]
    )
    out = {r["degree"]: r["n_nodes"] for r in degree_distribution(edges).collect()}
    assert out == {5: 1, 1: 5}


def test_directed_out_degree(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], ["from", "to"]
    )
    out = {
        r["degree"]: r["n_nodes"]
        for r in degree_distribution(edges, directed=True).collect()
    }
    # out-degrees: a=2, b=1 (c has none and is absent)
    assert out == {2: 1, 1: 1}


def test_dups_and_self_loops_dropped(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "a")], ["from", "to"]
    )
    out = {r["degree"]: r["n_nodes"] for r in degree_distribution(edges).collect()}
    assert out == {1: 2}


def test_alpha_matches_in_memory(spark):
    edge_list = [(f"h{i % 7}", f"n{j}") for j in range(60) for i in range(1 + j % 3)]
    edges = spark.createDataFrame(edge_list, ["from", "to"])
    r = powerlaw_alpha(edges, d_min=2).first()
    degs = {}
    seen = set()
    for u, v in edge_list:
        if u == v or (u, v) in seen:
            continue
        seen.add((u, v))
        degs[u] = degs.get(u, 0) + 1
        degs[v] = degs.get(v, 0) + 1
    want = powerlaw_alpha_exact(list(degs.values()), d_min=2)
    assert r["alpha"] == pytest.approx(want, abs=1e-5)
    assert r["n_nodes"] == len(degs)
    assert r["n_tail"] == sum(1 for d in degs.values() if d >= 2)
    assert r["max_degree"] == max(degs.values())


def test_alpha_validation(spark):
    edges = spark.createDataFrame([("a", "b")], ["from", "to"])
    with pytest.raises(ValueError):
        powerlaw_alpha(edges, d_min=0)
