"""Newman modularity — known answers, unassigned-node exclusion, DuckDB
parity."""

import duckdb
import pytest

from polars_grouper_spark.operators.modularity import modularity, modularity_sql


def rows(df, nd=9):
    return sorted(
        tuple(round(v, nd) if isinstance(v, float) else v for v in r)
        for r in df.collect()
    )


def test_two_cliques_bridge(spark):
    """Two triangles joined by one bridge, communities = the triangles:
    the textbook high-modularity case (Q = 2*(3/7 - (7/14)^2) ~ 0.357)."""
    tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
    tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
    edges = spark.createDataFrame(tri1 + tri2 + [("c", "x")], ["from", "to"])
    asg = spark.createDataFrame(
        [(n, "t1") for n in "abc"] + [(n, "t2") for n in "xyz"],
        ["node", "community"],
    )
    got = rows(modularity(edges, asg))
    q = sum(r[4] for r in got)
    assert q == pytest.approx(2 * (3 / 7 - (7 / 14) ** 2), abs=1e-6)
    t1 = [r for r in got if r[0] == "t1"][0]
    assert t1[1:4] == (3, 3, 7)  # 3 nodes, 3 internal edges, degree sum 7


def test_single_community_q_zero(spark):
    """Everything in one community: Q = m/m - (2m/2m)^2 = 0."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["from", "to"]
    )
    asg = spark.createDataFrame([(n, "all") for n in "abc"], ["node", "community"])
    got = rows(modularity(edges, asg))
    assert got == [("all", 3, 3, 6, 0.0)]


def test_unassigned_nodes_excluded(spark):
    """Edges touching unassigned nodes don't count toward m or degrees."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "ghost"), ("ghost", "a")], ["from", "to"]
    )
    asg = spark.createDataFrame(
        [("a", "c1"), ("b", "c1")], ["node", "community"]
    )
    got = rows(modularity(edges, asg))
    assert got == [("c1", 2, 1, 2, 0.0)]  # only the a-b edge survives


def test_duckdb_parity(spark):
    edges = [(f"n{(3 * i) % 13}", f"n{(5 * i + 1) % 13}") for i in range(30)]
    edges = [(a, b) for a, b in edges if a != b]
    asg = [(f"n{i}", f"c{i % 3}") for i in range(13)]
    e_df = spark.createDataFrame(edges, ["from", "to"])
    a_df = spark.createDataFrame(asg, ["node", "community"])
    got = rows(modularity(e_df, a_df))
    ev = ",".join(f"('{a}','{b}')" for a, b in edges)
    av = ",".join(f"('{n}','{c}')" for n, c in asg)
    want = sorted(
        tuple(round(v, 9) if isinstance(v, float) else v for v in r)
        for r in duckdb.sql(
            modularity_sql(
                f"SELECT * FROM (VALUES {ev}) t(src, dst)",
                f"SELECT * FROM (VALUES {av}) t(node, community)",
            )
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# conductance
# ---------------------------------------------------------------------------


def test_conductance_two_cliques(spark):
    """Two triangles + one bridge: each side has cut 1, volume 7."""
    from polars_grouper_spark.operators.modularity import conductance

    tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
    tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
    edges = spark.createDataFrame(tri1 + tri2 + [("c", "x")], ["from", "to"])
    asg = spark.createDataFrame(
        [(n, "t1") for n in "abc"] + [(n, "t2") for n in "xyz"],
        ["node", "community"],
    )
    got = rows(conductance(edges, asg))
    assert got == [
        ("t1", 1, 7, round(1 / 7, 9)),
        ("t2", 1, 7, round(1 / 7, 9)),
    ]


def test_conductance_single_community_null(spark):
    """One community holds everything: the complement volume is 0."""
    from polars_grouper_spark.operators.modularity import conductance

    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["from", "to"])
    asg = spark.createDataFrame([(n, "all") for n in "abc"], ["node", "community"])
    got = rows(conductance(edges, asg))
    assert got == [("all", 0, 4, None)]


def test_conductance_duckdb_parity(spark):
    from polars_grouper_spark.operators.modularity import (
        conductance,
        conductance_sql,
    )

    edges = [(f"n{(3 * i) % 13}", f"n{(5 * i + 1) % 13}") for i in range(30)]
    edges = [(a, b) for a, b in edges if a != b]
    asg = [(f"n{i}", f"c{i % 3}") for i in range(13)]
    e_df = spark.createDataFrame(edges, ["from", "to"])
    a_df = spark.createDataFrame(asg, ["node", "community"])
    got = rows(conductance(e_df, a_df))
    ev = ",".join(f"('{a}','{b}')" for a, b in edges)
    av = ",".join(f"('{n}','{c}')" for n, c in asg)
    want = sorted(
        tuple(round(v, 9) if isinstance(v, float) else v for v in r)
        for r in duckdb.sql(
            conductance_sql(
                f"SELECT * FROM (VALUES {ev}) t(src, dst)",
                f"SELECT * FROM (VALUES {av}) t(node, community)",
            )
        ).fetchall()
    )
    assert got == want
