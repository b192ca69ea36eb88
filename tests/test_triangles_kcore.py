"""Triangle counting and k-core decomposition (beyond-reference graph
operators) — known-answer fixtures, input-coercion/null semantics, and
degeneracy cases."""

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.operators.kcore import k_core
from polars_grouper_spark.operators.triangles import triangle_count


def rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------


def test_triangle_k4(spark):
    """K4: every node is in C(3,2)=3 triangles, 4 triangles total."""
    nodes = ["a", "b", "c", "d"]
    edges = spark.createDataFrame(
        [(x, y) for x in nodes for y in nodes if x < y], ["from", "to"]
    )
    assert rows(triangle_count(edges), "node", "n_triangles") == [
        (n, 3) for n in nodes
    ]


def test_triangle_free_graph(spark):
    """A star has no triangles but every node appears with 0."""
    edges = spark.createDataFrame(
        [("hub", f"s{i}") for i in range(5)], ["from", "to"]
    )
    got = rows(triangle_count(edges), "node", "n_triangles")
    assert got == sorted([(f"s{i}", 0) for i in range(5)] + [("hub", 0)])


def test_triangle_duplicate_and_reversed_edges_collapse(spark):
    """Parallel edges and both orientations count as one edge."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        ["from", "to"],
    )
    assert rows(triangle_count(edges), "node", "n_triangles") == [
        ("a", 1),
        ("b", 1),
        ("c", 1),
    ]


def test_triangle_nulls_and_self_loops_dropped(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", None), ("b", "b")],
        ["from", "to"],
    )
    assert rows(triangle_count(edges), "node", "n_triangles") == [
        ("a", 1),
        ("b", 1),
        ("c", 1),
    ]


def test_triangle_numeric_ids_coerced(spark):
    """Reference coercion contract: any endpoint dtype -> string."""
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["from", "to"])
    assert rows(triangle_count(edges), "node", "n_triangles") == [
        ("1", 1),
        ("2", 1),
        ("3", 1),
    ]


def test_triangle_two_sharing_an_edge(spark):
    """Two triangles glued on edge (a,b): a,b in 2 each, c,d in 1."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"), ("d", "a")],
        ["from", "to"],
    )
    assert rows(triangle_count(edges), "node", "n_triangles") == [
        ("a", 2),
        ("b", 2),
        ("c", 1),
        ("d", 1),
    ]


# ---------------------------------------------------------------------------
# k_core
# ---------------------------------------------------------------------------


def test_kcore_peels_tail(spark):
    """Triangle with a pendant path: 2-core = the triangle; the path
    peels over multiple rounds (d then e)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
        ["from", "to"],
    )
    assert rows(k_core(edges, 2), "node", "core_deg") == [
        ("a", 2),
        ("b", 2),
        ("c", 2),
    ]


def test_kcore_empty_when_k_exceeds_degeneracy(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["from", "to"]
    )
    out = k_core(edges, 3)
    assert out.count() == 0
    assert out.columns == ["node", "core_deg"]


def test_kcore_k1_keeps_all_non_isolated(spark):
    edges = spark.createDataFrame([("a", "b"), ("c", "d")], ["from", "to"])
    assert rows(k_core(edges, 1), "node", "core_deg") == [
        ("a", 1),
        ("b", 1),
        ("c", 1),
        ("d", 1),
    ]


def test_kcore_cascading_peel(spark):
    """Chain of degree-2 nodes hanging off a K4: k=3 must cascade the
    whole chain away round by round, keeping exactly the K4."""
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    chain = [("d", "x1"), ("x1", "x2"), ("x2", "x3")]
    edges = spark.createDataFrame(k4 + chain, ["from", "to"])
    assert rows(k_core(edges, 3), "node", "core_deg") == [
        ("a", 3),
        ("b", 3),
        ("c", 3),
        ("d", 3),
    ]


def test_kcore_parallel_edges_do_not_inflate_degree(spark):
    """Degree counts distinct neighbors: a doubled edge must not let a
    degree-1 node survive k=2."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("c", "a")],
        ["from", "to"],
    )
    assert rows(k_core(edges, 2), "node", "core_deg") == [
        ("a", 2),
        ("b", 2),
        ("c", 2),
    ]


def test_kcore_invalid_k(spark):
    edges = spark.createDataFrame([("a", "b")], ["from", "to"])
    with pytest.raises(ValueError, match="k must be >= 1"):
        k_core(edges, 0)


def test_kcore_max_iter_guard(spark):
    """A long path with k=2 peels one node per end per round; max_iter=1
    cannot converge and must raise the documented error."""
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i + 1}") for i in range(8)], ["from", "to"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        k_core(edges, 2, max_iter=1)


def test_triangle_and_kcore_agree_on_clique_membership(spark):
    """On K5 plus a pendant, the 4-core and the triangle-positive node
    set both recover exactly the clique."""
    nodes = [f"v{i}" for i in range(5)]
    k5 = [(x, y) for x in nodes for y in nodes if x < y]
    edges = spark.createDataFrame(k5 + [("v0", "tail")], ["from", "to"])
    core = {r[0] for r in k_core(edges, 4).collect()}
    tri = {
        r["node"]
        for r in triangle_count(edges).where(F.col("n_triangles") > 0).collect()
    }
    assert core == set(nodes)
    assert tri == set(nodes)


def test_kcore_midloop_local_finish_matches_both_tiers(spark):
    """Round-9 per-round tier re-evaluation: a run that STARTS
    distributed (raw count above a small guard) must switch to the
    driver-local peel once the residual shrinks under the guard, and the
    result must match both the pure-local and pure-distributed tiers —
    exact by k-core uniqueness.  Chain + triangle peels the chain away
    over many rounds, exercising the switch mid-peel."""
    chain = spark.createDataFrame(
        [(str(i), str(i + 1)) for i in range(60)]
        + [("x0", "x1"), ("x1", "x2"), ("x2", "x0")],
        ["from", "to"],
    )
    want = [("x0", 2), ("x1", 2), ("x2", 2)]
    full_local = sorted(map(tuple, k_core(chain, 2, max_iter=200).collect()))
    distributed = sorted(
        map(tuple, k_core(chain, 2, max_iter=200, max_local_edges=0).collect())
    )
    mid_switch = sorted(
        map(tuple, k_core(chain, 2, max_iter=200, max_local_edges=55).collect())
    )
    assert full_local == distributed == mid_switch == want


def test_ktruss_midloop_and_broadcast_shapes_agree(spark):
    """Round-9: the k-truss closure-join broadcast guard and the
    mid-loop local finish must not change results.  Four shapes on one
    graph: entry local tier, pure distributed sort-merge
    (max_broadcast_edges=0), pure distributed broadcast, and a
    distributed start that switches to the local peel mid-run."""
    from polars_grouper_spark.operators.ktruss import k_truss

    nodes = [f"v{i}" for i in range(6)]
    k6 = [(x, y) for x in nodes for y in nodes if x < y]
    extra = [("v0", f"t{i}") for i in range(30)] + [
        (f"t{i}", f"t{i+1}") for i in range(29)
    ]
    df = spark.createDataFrame(k6 + extra, ["from", "to"])
    want = sorted(map(tuple, k_truss(df, 4).collect()))
    dist_smj = sorted(
        map(
            tuple,
            k_truss(df, 4, max_local_edges=0, max_broadcast_edges=0).collect(),
        )
    )
    dist_bc = sorted(
        map(tuple, k_truss(df, 4, max_local_edges=0).collect())
    )
    mid = sorted(map(tuple, k_truss(df, 4, max_local_edges=40).collect()))
    assert want == dist_smj == dist_bc == mid
    assert {(r[0], r[1]) for r in want} == {(x, y) for x, y in k6}
