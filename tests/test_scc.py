"""Strongly connected components (distributed FW-BW with min-id pivots)
— known-answer fixtures, null/self-loop semantics, and DuckDB
transitive-closure parity."""

import duckdb
import pytest

from polars_grouper_spark.operators.scc import (
    strongly_connected_components,
    strongly_connected_components_sql,
)


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def duck(edges):
    vals = ",".join(
        "(%s,%s)"
        % (
            "NULL" if a is None else f"'{a}'",
            "NULL" if b is None else f"'{b}'",
        )
        for a, b in edges
    )
    sql = strongly_connected_components_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)"
    )
    return sorted(tuple(r) for r in duckdb.sql(sql).fetchall())


def test_two_cycles_and_bridge(spark):
    """{a,b,c} cycle -> bridge -> {d,e} cycle."""
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"), ("e", "d")]
    got = rows(strongly_connected_components(spark.createDataFrame(edges, ["from", "to"])))
    assert got == [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d")]


def test_dag_all_singletons(spark):
    """A DAG dissolves in the trim phase: every node its own SCC."""
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    got = rows(strongly_connected_components(spark.createDataFrame(edges, ["from", "to"])))
    assert got == [(n, n) for n in "abcd"]


def test_single_cycle(spark):
    edges = [(f"n{i}", f"n{(i + 1) % 7}") for i in range(7)]
    got = rows(strongly_connected_components(spark.createDataFrame(edges, ["from", "to"])))
    assert got == [(f"n{i}", "n0") for i in range(7)]


def test_direction_matters(spark):
    """a->b plus b->a is one SCC; a->b alone is two singletons."""
    one_way = spark.createDataFrame([("a", "b")], ["from", "to"])
    assert rows(strongly_connected_components(one_way)) == [("a", "a"), ("b", "b")]
    both = spark.createDataFrame([("a", "b"), ("b", "a")], ["from", "to"])
    assert rows(strongly_connected_components(both)) == [("a", "a"), ("b", "a")]


def test_null_and_self_loop_semantics(spark):
    """Null endpoints drop the edge (SURVEY §1.3); self-loops are
    dropped and the node survives only via other edges."""
    edges = [("a", "b"), ("b", "a"), (None, "x"), ("y", None), ("z", "z")]
    got = rows(
        strongly_connected_components(
            spark.createDataFrame(edges, ["from", "to"])
        )
    )
    # x, y, z have no surviving edges -> absent entirely.
    assert got == [("a", "a"), ("b", "a")]


def test_long_int_ids_coerced(spark):
    edges = spark.createDataFrame([(1, 2), (2, 1), (2, 3)], ["from", "to"])
    got = rows(strongly_connected_components(edges))
    assert got == [("1", "1"), ("2", "1"), ("3", "3")]


def test_duckdb_parity_functional_graph(spark):
    """i -> (3i+1) mod 11: a functional graph whose SCCs are its cycles."""
    edges = [(f"m{i}", f"m{(3 * i + 1) % 11}") for i in range(11)]
    got = rows(strongly_connected_components(spark.createDataFrame(edges, ["from", "to"])))
    assert got == duck(edges)


def test_duckdb_parity_dense_random(spark):
    """Hash-derived dense directed graph: nested/overlapping cycles."""
    edges = [(f"v{(5 * i) % 13}", f"v{(7 * i + 2) % 13}") for i in range(40)]
    edges = [(a, b) for a, b in edges if a != b]
    got = rows(strongly_connected_components(spark.createDataFrame(edges, ["from", "to"])))
    assert got == duck(edges)


def test_max_rounds_guard(spark):
    """A too-small bound raises instead of silently looping."""
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i + 1}") for i in range(20)], ["from", "to"]
    )
    # max_local_edges=0 forces the distributed loop: the local Tarjan
    # tier has no round bound to trip.
    with pytest.raises(RuntimeError, match="max_rounds"):
        strongly_connected_components(edges, max_rounds=2, max_local_edges=0)


def test_condensation_contracts_cycles(spark):
    from polars_grouper_spark.operators.scc import condensation

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"), ("d", "c"), ("d", "e")],
        ["from", "to"],
    )
    out = {(r["src_scc"], r["dst_scc"]) for r in condensation(edges).collect()}
    # {a,b} -> {c,d} -> {e}; intra-SCC edges vanish.
    assert out == {("a", "c"), ("c", "e")}


def test_condensation_is_acyclic_on_random_graph(spark):
    from polars_grouper_spark.operators.scc import condensation

    edges = spark.createDataFrame(
        [(f"n{i % 9}", f"n{(i * 4 + 1) % 9}") for i in range(30)], ["from", "to"]
    )
    dag = [(r["src_scc"], r["dst_scc"]) for r in condensation(edges).collect()]
    # Kahn's algorithm completes iff acyclic.
    nodes = {n for e in dag for n in e}
    indeg = {n: 0 for n in nodes}
    for _, b in dag:
        indeg[b] += 1
    queue = [n for n in nodes if indeg[n] == 0]
    seen = 0
    while queue:
        n = queue.pop()
        seen += 1
        for a, b in dag:
            if a == n:
                indeg[b] -= 1
                if indeg[b] == 0:
                    queue.append(b)
    assert seen == len(nodes), "condensation produced a cycle"


def test_scc_local_and_distributed_tiers_identical(spark):
    """The guarded local Tarjan must equal the distributed FW-BW loop
    exactly — the min-member-name label is partition-pure."""
    from polars_grouper_spark.operators.scc import (
        strongly_connected_components,
    )

    edges = spark.createDataFrame(
        [(f"n{(3 * i) % 13}", f"n{(5 * i + 2) % 13}") for i in range(30)]
        + [("x1", "x2"), ("x2", "x1"), ("x2", "y")],
        ["from", "to"],
    )
    loc = sorted(
        tuple(r) for r in strongly_connected_components(edges).collect()
    )
    dist = sorted(
        tuple(r)
        for r in strongly_connected_components(
            edges, max_local_edges=0
        ).collect()
    )
    assert loc == dist


def test_bowtie_local_and_distributed_tiers_identical(spark):
    from polars_grouper_spark.operators.scc import bowtie_decomposition

    # core cycle {c0,c1,c2}, IN chain, OUT chain, disconnected pair
    edges = spark.createDataFrame(
        [
            ("c0", "c1"), ("c1", "c2"), ("c2", "c0"),
            ("i0", "i1"), ("i1", "c0"),
            ("c1", "o0"), ("o0", "o1"),
            ("z0", "z1"),
        ],
        ["from", "to"],
    )
    loc = sorted(tuple(r) for r in bowtie_decomposition(edges).collect())
    dist = sorted(
        tuple(r)
        for r in bowtie_decomposition(edges, max_local_edges=0).collect()
    )
    assert loc == dist
    got = dict(loc)
    assert got == {
        "c0": "SCC", "c1": "SCC", "c2": "SCC",
        "i0": "IN", "i1": "IN",
        "o0": "OUT", "o1": "OUT",
        "z0": "OTHER", "z1": "OTHER",
    }
