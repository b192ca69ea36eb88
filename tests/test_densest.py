"""Densest-subgraph peeling — hand graphs, integer threshold exactness,
DuckDB round parity."""

import duckdb

from polars_grouper_spark.operators.densest import (
    densest_subgraph_rounds,
    densest_subgraph_rounds_sql,
)


def test_clique_plus_path_keeps_the_clique(spark):
    # K5 (density 2.0) with a long tail path (density ~0.5 alone)
    clique = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    tail = [(f"t{i}", f"t{i+1}") for i in range(12)] + [("c0", "t0")]
    df = spark.createDataFrame(clique + tail, ["from", "to"])
    rounds = densest_subgraph_rounds(df, eps_num=3, eps_den=2).collect()
    best = max(rounds, key=lambda r: r["density"])
    # the surviving densest prefix is the clique itself: 5 nodes, 10 edges
    assert (best["n_nodes"], best["n_edges"]) == (5, 10)
    assert best["density"] == 2.0


def test_self_loops_and_duplicates_cleaned(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "a"), ("b", "c")], ["from", "to"]
    )
    r0 = densest_subgraph_rounds(df).where("round = 0").first()
    assert (r0["n_nodes"], r0["n_edges"]) == (3, 2)


def test_duckdb_round_parity(spark):
    edges = [(f"n{(7 * i) % 13}", f"n{(3 * i + 1) % 13}") for i in range(40)]
    df = spark.createDataFrame(edges, ["from", "to"])
    got = sorted(
        tuple(r)
        for r in densest_subgraph_rounds(
            df, eps_num=3, eps_den=2, max_rounds=12
        ).collect()
    )
    vals = ",".join(f"('{a}','{b}')" for a, b in edges)
    sql = densest_subgraph_rounds_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)",
        eps_num=3, eps_den=2, rounds=12,
    )
    want = sorted(duckdb.sql(sql).fetchall())
    assert got == want
