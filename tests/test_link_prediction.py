"""Link prediction (common-neighbors / Jaccard / Adamic-Adar) and local
clustering coefficient — known-answer fixtures, hub-cap behavior, null
semantics, and DuckDB parity on a pseudo-random graph."""

import math

import duckdb
import pytest

from polars_grouper_spark.operators.link_prediction import (
    link_scores,
    link_scores_sql,
)
from polars_grouper_spark.operators.triangles import (
    clustering_coefficient,
    clustering_coefficient_sql,
)


def rows(df, *cols, nd=9):
    out = []
    for r in df.select(*cols).collect():
        out.append(
            tuple(round(v, nd) if isinstance(v, float) else v for v in r)
        )
    return sorted(out)


def duck_rows(sql, nd=9):
    out = []
    for r in duckdb.sql(sql).fetchall():
        out.append(
            tuple(round(v, nd) if isinstance(v, float) else v for v in r)
        )
    return sorted(out)


def values_sql(edges):
    vals = ",".join(f"('{a}','{b}')" for a, b in edges)
    return f"SELECT * FROM (VALUES {vals}) t(src, dst)"


# ---------------------------------------------------------------------------
# link_scores
# ---------------------------------------------------------------------------


def test_path_graph_scores(spark):
    """Path a-b-c-d: (a,c) and (b,d) share one center each; (a,d) none."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["from", "to"]
    )
    got = rows(
        link_scores(edges), "node_a", "node_b", "common_neighbors", "jaccard",
        "adamic_adar",
    )
    # deg(a)=1, deg(c)=2 -> jaccard = 1 / (1 + 2 - 1) = 0.5
    aa = round(1.0 / math.log(2.0), 9)
    assert got == [
        ("a", "c", 1, 0.5, aa),
        ("b", "d", 1, 0.5, aa),
    ]


def test_adjacent_pairs_excluded(spark):
    """A triangle has no non-adjacent pairs: empty output."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["from", "to"]
    )
    assert link_scores(edges).count() == 0


def test_null_and_self_loop_edges_dropped(spark):
    """Null endpoints and self-loops never create wedges (SURVEY §1.3)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), (None, "x"), ("y", None), ("z", "z")],
        ["from", "to"],
    )
    got = rows(link_scores(edges), "node_a", "node_b", "common_neighbors")
    assert got == [("a", "c", 1)]


def test_parallel_edges_counted_once(spark):
    """Multiplicity is irrelevant: overlap is a set notion."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("c", "b")],
        ["from", "to"],
    )
    got = rows(link_scores(edges), "node_a", "node_b", "common_neighbors",
               "jaccard")
    assert got == [("a", "c", 1, 1.0)]


def test_max_center_degree_skips_hub(spark):
    """With the hub capped out, spoke pairs lose their only wedge center."""
    edges = [("hub", f"s{i}") for i in range(4)] + [("s0", "s1"), ("s1", "s2")]
    df = spark.createDataFrame(edges, ["from", "to"])
    exact = rows(link_scores(df), "node_a", "node_b", "common_neighbors")
    # Exact: C(4,2)=6 spoke pairs minus the 2 adjacent ones have the hub
    # as a center; (s0,s2) additionally via s1.
    assert ("s0", "s2", 2) in exact and ("s2", "s3", 1) in exact
    capped = rows(
        link_scores(df, max_center_degree=3),
        "node_a", "node_b", "common_neighbors",
    )
    # Hub (degree 4) skipped: only s1 (deg 3) centers a non-adjacent pair.
    assert capped == [("s0", "s2", 1)]


def test_duckdb_parity_random_graph(spark):
    """Full-metric parity with the SQL oracle on a hash-derived graph."""
    edges = [
        (f"n{(7 * i) % 23}", f"n{(11 * i + 3) % 23}") for i in range(60)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["from", "to"])
    got = rows(
        link_scores(df), "node_a", "node_b", "common_neighbors", "jaccard",
        "adamic_adar",
    )
    want = duck_rows(link_scores_sql(values_sql(edges)))
    assert got == want


def test_duckdb_parity_capped(spark):
    """The oracle replicates the hub cap too."""
    edges = [("hub", f"s{i}") for i in range(6)] + [
        ("s0", "s1"), ("s2", "s3"), ("s1", "s2")
    ]
    df = spark.createDataFrame(edges, ["from", "to"])
    got = rows(
        link_scores(df, max_center_degree=4),
        "node_a", "node_b", "common_neighbors", "jaccard", "adamic_adar",
    )
    want = duck_rows(link_scores_sql(values_sql(edges), max_center_degree=4))
    assert got == want


# ---------------------------------------------------------------------------
# clustering_coefficient
# ---------------------------------------------------------------------------


def test_lcc_triangle_with_tail(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], ["from", "to"]
    )
    got = rows(
        clustering_coefficient(edges), "node", "degree", "n_triangles", "lcc"
    )
    assert got == [
        ("a", 2, 1, 1.0),
        ("b", 2, 1, 1.0),
        ("c", 3, 1, round(1 / 3, 9)),
        ("d", 1, 0, 0.0),
    ]


def test_lcc_complete_graph_is_one(spark):
    nodes = [f"k{i}" for i in range(5)]
    edges = spark.createDataFrame(
        [(x, y) for x in nodes for y in nodes if x < y], ["from", "to"]
    )
    got = rows(clustering_coefficient(edges), "node", "lcc")
    assert got == [(n, 1.0) for n in nodes]


def test_lcc_duckdb_parity(spark):
    edges = [
        (f"n{(5 * i) % 17}", f"n{(13 * i + 1) % 17}") for i in range(40)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["from", "to"])
    got = rows(
        clustering_coefficient(df), "node", "degree", "n_triangles", "lcc"
    )
    want = duck_rows(clustering_coefficient_sql(values_sql(edges)))
    assert got == want


# ---------------------------------------------------------------------------
# square_count (shares the wedge pipeline)
# ---------------------------------------------------------------------------


def test_square_known_answers(spark):
    from polars_grouper_spark.operators.triangles import square_count

    ring4 = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], ["from", "to"]
    )
    assert square_count(ring4).collect()[0]["n_squares"] == 1
    k4 = spark.createDataFrame(
        [(x, y) for x in "abcd" for y in "abcd" if x < y], ["from", "to"]
    )
    assert square_count(k4).collect()[0]["n_squares"] == 3
    tri = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["from", "to"]
    )
    assert square_count(tri).collect()[0]["n_squares"] == 0


def test_square_duckdb_parity(spark):
    from polars_grouper_spark.operators.triangles import (
        square_count,
        square_count_sql,
    )

    edges = [(f"n{(7 * i) % 19}", f"n{(11 * i + 3) % 19}") for i in range(50)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["from", "to"])
    got = square_count(df).collect()[0]["n_squares"]
    want = duck_rows(square_count_sql(values_sql(edges)))[0][0]
    assert got == want


# ---------------------------------------------------------------------------
# project_bipartite
# ---------------------------------------------------------------------------


def test_projection_weights(spark):
    from polars_grouper_spark.operators.link_prediction import project_bipartite

    rows_in = [
        (1, "x"), (1, "y"), (2, "x"), (2, "y"), (2, "z"), (3, "x"), (3, "x"),
    ]
    df = spark.createDataFrame(rows_in, ["anchor", "item"])
    got = rows(project_bipartite(df, "anchor", "item"), "item_a", "item_b", "weight")
    # x-y share anchors {1,2}; duplicates within an anchor count once
    assert got == [("x", "y", 2), ("x", "z", 1), ("y", "z", 1)]


def test_projection_anchor_cap(spark):
    from polars_grouper_spark.operators.link_prediction import project_bipartite

    mega = [(9, f"i{k}") for k in range(10)] + [(1, "a"), (1, "b")]
    df = spark.createDataFrame(mega, ["anchor", "item"])
    got = rows(project_bipartite(df, "anchor", "item", max_anchor_degree=5),
               "item_a", "item_b", "weight")
    assert got == [("a", "b", 1)]  # the 10-item anchor is skipped


def test_projection_duckdb_parity(spark):
    from polars_grouper_spark.operators.link_prediction import (
        project_bipartite,
        project_bipartite_sql,
    )

    rows_in = [((i * 3) % 7, f"p{(i * 5) % 9}") for i in range(40)]
    df = spark.createDataFrame(rows_in, ["anchor", "item"])
    got = rows(project_bipartite(df, "anchor", "item", max_anchor_degree=4),
               "item_a", "item_b", "weight")
    vals = ",".join(f"({a},'{b}')" for a, b in rows_in)
    want = duck_rows(
        project_bipartite_sql(
            f"SELECT * FROM (VALUES {vals}) t(anchor, item)",
            max_anchor_degree=4,
        )
    )
    assert got == want


# ---------------------------------------------------------------------------
# degree_assortativity
# ---------------------------------------------------------------------------


def test_assortativity_star_negative(spark):
    from polars_grouper_spark.operators.triangles import degree_assortativity

    edges = spark.createDataFrame(
        [("hub", f"s{i}") for i in range(6)], ["from", "to"]
    )
    r = degree_assortativity(edges).collect()[0]["assortativity"]
    assert r == -1.0  # pure star: maximally disassortative


def test_assortativity_regular_graph_null(spark):
    from polars_grouper_spark.operators.triangles import degree_assortativity

    ring = spark.createDataFrame(
        [(f"n{i}", f"n{(i + 1) % 6}") for i in range(6)], ["from", "to"]
    )
    r = degree_assortativity(ring).collect()[0]["assortativity"]
    assert r is None  # all degrees equal: zero variance


def test_assortativity_duckdb_parity(spark):
    from polars_grouper_spark.operators.triangles import (
        degree_assortativity,
        degree_assortativity_sql,
    )

    edges = [(f"m{i}", f"m{i + 1}") for i in range(10)] + [
        ("m0", "m5"), ("m0", "m7"), ("m3", "m9")
    ]
    df = spark.createDataFrame(edges, ["from", "to"])
    got = degree_assortativity(df).collect()[0]["assortativity"]
    want = duck_rows(degree_assortativity_sql(values_sql(edges)))[0][0]
    assert got == want
