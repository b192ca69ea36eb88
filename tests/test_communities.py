"""LPA community detection: determinism, structure recovery, quirks."""

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.operators.communities import lpa_communities


def _rows(df):
    return {(r["node"], r["community"]) for r in df.collect()}


def test_two_cliques_bridge(spark):
    # Two 4-cliques joined by one bridge edge: LPA should give each
    # clique one community.
    cl1 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    cl2 = [(a, b) for a in "wxyz" for b in "wxyz" if a < b]
    edges = spark.createDataFrame(cl1 + cl2 + [("d", "w")], ["from", "to"])
    out = lpa_communities(edges, "from", "to", rounds=4).collect()
    comm = {r["node"]: r["community"] for r in out}
    assert len(comm) == 8
    assert len({comm[n] for n in "abcd"}) == 1
    assert len({comm[n] for n in "wxyz"}) == 1
    assert comm["a"] != comm["z"]


def test_zero_rounds_identity(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["from", "to"])
    out = _rows(lpa_communities(edges, "from", "to", rounds=0))
    assert out == {("a", "a"), ("b", "b"), ("c", "c")}


def test_deterministic_across_runs(spark):
    edges = spark.createDataFrame(
        [(i % 17, (i * 7 + 3) % 17) for i in range(60)], ["from", "to"]
    ).where("`from` <> `to`")
    a = _rows(lpa_communities(edges, "from", "to", rounds=4))
    b = _rows(
        lpa_communities(edges.repartition(7), "from", "to", rounds=4)
    )
    assert a == b


def test_null_and_self_loop_dropped(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", None), (None, "b"), ("c", "c")], ["from", "to"]
    )
    out = _rows(lpa_communities(edges, "from", "to", rounds=2))
    # c only has a self-loop -> no edges -> absent.
    assert {n for n, _ in out} == {"a", "b"}


def test_directed_flag(spark):
    # a -> b only: with directed=True, b gets a's label but a keeps
    # nothing to vote from, so a is... a has no in-edges: it receives no
    # votes and drops out of the label frame after round 1.
    edges = spark.createDataFrame([("a", "b")], ["from", "to"])
    out = _rows(lpa_communities(edges, "from", "to", rounds=1, directed=True))
    assert out == {("b", "a")}


def test_rounds_validation(spark):
    edges = spark.createDataFrame([("a", "b")], ["from", "to"])
    with pytest.raises(ValueError):
        lpa_communities(edges, "from", "to", rounds=-1)


def test_int_nodes_coerced_to_string(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["from", "to"])
    out = lpa_communities(edges, "from", "to", rounds=2)
    assert dict(out.dtypes) == {"node": "string", "community": "string"}
