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


def test_local_tier_matches_distributed(spark):
    # r9-opt: the guarded driver-local peel must be bit-identical to the
    # distributed loop (max_local_edges=0 forces the distributed path).
    edges = [(f"n{(5 * i) % 17}", f"n{(2 * i + 3) % 17}") for i in range(60)]
    df = spark.createDataFrame(edges, ["from", "to"])
    local = sorted(
        tuple(r)
        for r in densest_subgraph_rounds(
            df, eps_num=11, eps_den=10, max_rounds=20
        ).collect()
    )
    dist = sorted(
        tuple(r)
        for r in densest_subgraph_rounds(
            df, eps_num=11, eps_den=10, max_rounds=20, max_local_edges=0
        ).collect()
    )
    assert local == dist
