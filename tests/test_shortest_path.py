"""Ported reference golden tests for calculate_shortest_path.

Reference: /root/reference/tests/test_graph_solver.py:367-433.
"""

import pytest

from polars_grouper_spark import calculate_shortest_path


def _wedges(spark, frm, to, w):
    return spark.createDataFrame(
        list(zip(frm, to, w)), schema="`from` string, `to` string, weight double"
    ).coalesce(1)


def _as_dict(df):
    return {(r["from"], r["to"]): r["distance"] for r in df.collect()}


def test_undirected_all_pairs(spark):
    df = _wedges(spark, ["A", "A", "B", "C"], ["B", "C", "C", "D"], [1.0, 2.0, 1.0, 1.5])
    paths = _as_dict(calculate_shortest_path(df, directed=False))
    expected = {
        ("A", "B"): 1.0,
        ("A", "C"): 2.0,
        ("A", "D"): 3.5,
        ("B", "C"): 1.0,
        ("B", "D"): 2.5,
        ("C", "D"): 1.5,
    }
    assert len(paths) == len(expected)
    for k, v in expected.items():
        assert paths[k] == pytest.approx(v, abs=1e-9), k


def test_directed_asymmetric(spark):
    df = _wedges(spark, ["A", "B", "B", "C"], ["B", "C", "A", "A"], [1.0, 2.0, 3.0, 4.0])
    paths = _as_dict(calculate_shortest_path(df, directed=True))
    assert paths[("A", "B")] == pytest.approx(1.0, abs=1e-6)
    assert paths[("B", "A")] == pytest.approx(3.0, abs=1e-6)


def test_cycle_min_weight(spark):
    df = _wedges(spark, ["A", "B", "C", "A"], ["B", "C", "A", "C"], [1.0, 1.0, 3.0, 2.0])
    paths = _as_dict(calculate_shortest_path(df, directed=True))
    assert paths[("A", "C")] == pytest.approx(2.0, abs=1e-6)


def test_empty_graph(spark):
    df = spark.createDataFrame([], schema="`from` string, `to` string, weight double")
    out = calculate_shortest_path(df)
    assert out.columns == ["from", "to", "distance"]
    assert out.count() == 0


def test_unreachable_pairs_omitted(spark):
    df = _wedges(spark, ["A", "X"], ["B", "Y"], [1.0, 1.0])
    paths = _as_dict(calculate_shortest_path(df, directed=False))
    assert set(paths) == {("A", "B"), ("X", "Y")}


def test_weight_quantization_truncates(spark):
    # 0.0015 * 1000 -> 1 (truncation), so distance comes back 0.001.
    df = _wedges(spark, ["A"], ["B"], [0.0015])
    paths = _as_dict(calculate_shortest_path(df, directed=True))
    assert paths[("A", "B")] == pytest.approx(0.001, abs=1e-12)


def test_sources_subset(spark):
    df = _wedges(spark, ["A", "B"], ["B", "C"], [1.0, 1.0])
    out = calculate_shortest_path(df, directed=True, sources=["A"])
    paths = _as_dict(out)
    assert set(paths) == {("A", "B"), ("A", "C")}


def test_max_distance_cutoff_prunes_far_pairs(spark):
    """Pairs beyond the cutoff are omitted; pairs within it keep their
    EXACT distance (pruning mid-loop must not lose a shorter path that
    passes through a node at the boundary)."""
    df = _wedges(
        spark,
        ["A", "A", "B", "C"],
        ["B", "C", "C", "D"],
        [1.0, 2.0, 1.0, 1.5],
    )
    full = _as_dict(calculate_shortest_path(df, directed=False))
    cut = _as_dict(calculate_shortest_path(df, directed=False, max_distance=2.5))
    assert cut == {k: v for k, v in full.items() if v <= 2.5}
    assert ("A", "D") not in cut and ("B", "D") in cut


def test_max_distance_with_sources(spark):
    df = _wedges(
        spark,
        ["A", "B", "C", "D"],
        ["B", "C", "D", "E"],
        [1.0, 1.0, 1.0, 1.0],
    )
    got = _as_dict(
        calculate_shortest_path(df, directed=True, sources=["A"], max_distance=2.0)
    )
    assert got == {("A", "B"): 1.0, ("A", "C"): 2.0}


def test_max_distance_quantization_boundary(spark):
    """Cutoff quantizes by truncation exactly like weights: a path of
    2.0005 quantizes to 2000 and survives a cutoff of 2.0."""
    df = _wedges(spark, ["A", "B"], ["B", "C"], [1.0, 1.0005])
    got = _as_dict(
        calculate_shortest_path(df, directed=True, sources=["A"], max_distance=2.0)
    )
    assert got[("A", "C")] == 2.0  # 1000 + 1000 (truncated) = 2000 <= 2000


# ---------------------------------------------------------------------------
# harmonic_centrality
# ---------------------------------------------------------------------------


def test_harmonic_path_graph(spark):
    """Path a-b-c with unit weights: HC(b)=2, HC(a)=HC(c)=1.5."""
    from polars_grouper_spark.operators.shortest_path import harmonic_centrality

    df = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0)], ["from", "to", "weight"]
    )
    got = {r["node"]: r["centrality"] for r in harmonic_centrality(df).collect()}
    assert got == {"a": 1.5, "b": 2.0, "c": 1.5}


def test_harmonic_disconnected_components(spark):
    """Unreachable pairs contribute 0 — no infinities (the point of
    harmonic over closeness)."""
    from polars_grouper_spark.operators.shortest_path import harmonic_centrality

    df = spark.createDataFrame(
        [("a", "b", 1.0), ("x", "y", 2.0)], ["from", "to", "weight"]
    )
    got = {r["node"]: r["centrality"] for r in harmonic_centrality(df).collect()}
    assert got == {"a": 1.0, "b": 1.0, "x": 0.5, "y": 0.5}


def test_harmonic_max_distance_truncates(spark):
    from polars_grouper_spark.operators.shortest_path import harmonic_centrality

    df = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0)], ["from", "to", "weight"]
    )
    got = {
        r["node"]: r["centrality"]
        for r in harmonic_centrality(df, max_distance=1.0).collect()
    }
    # the a-c pair (distance 2) is truncated away
    assert got == {"a": 1.0, "b": 2.0, "c": 1.0}


def test_closeness_path_graph_hand_computed(spark):
    """Path a-b-c (unit weights): classic closeness values, full reach."""
    from polars_grouper_spark.operators.shortest_path import closeness_centrality

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0)], ["from", "to", "weight"]
    )
    got = {r["node"]: r for r in closeness_centrality(edges).collect()}
    # b: sum_d = 2, r-1 = 2, N-1 = 2 -> 4 / (2*2) = 1.0
    assert got["b"]["closeness"] == 1.0 and got["b"]["n_reachable"] == 3
    # a: sum_d = 1+2 = 3 -> 4 / (2*3)
    assert abs(got["a"]["closeness"] - round(4 / 6, 8)) < 1e-9
    assert got["a"]["closeness"] == got["c"]["closeness"]


def test_closeness_disconnected_penalizes_small_component(spark):
    """Wasserman-Faust: a node central to a 2-clique must not out-score
    the center of a 4-path just because its sums are tiny."""
    from polars_grouper_spark.operators.shortest_path import closeness_centrality

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0), ("x", "y", 1.0)],
        ["from", "to", "weight"],
    )
    got = {r["node"]: r for r in closeness_centrality(edges).collect()}
    assert got["x"]["n_reachable"] == 2
    assert got["b"]["closeness"] > got["x"]["closeness"]


def test_local_and_distributed_tiers_identical(spark):
    """Guarded local Dijkstra == distributed relaxation, including the
    bounded-sources + cutoff + directed combinations."""
    from polars_grouper_spark.operators.shortest_path import (
        calculate_shortest_path,
    )

    edges = spark.createDataFrame(
        [
            (f"n{(3 * i) % 9}", f"n{(5 * i + 1) % 9}", (i % 4) + 0.25)
            for i in range(25)
        ],
        ["from", "to", "weight"],
    )
    for kwargs in (
        {},
        {"directed": True},
        {"sources": ["n0", "n3"]},
        {"max_distance": 1.5},
        {"directed": True, "sources": ["n1"], "max_distance": 2.0},
    ):
        loc = sorted(
            tuple(r) for r in calculate_shortest_path(edges, **kwargs).collect()
        )
        dist = sorted(
            tuple(r)
            for r in calculate_shortest_path(
                edges, max_local_edges=0, **kwargs
            ).collect()
        )
        assert loc == dist, f"tier divergence for {kwargs}"


def test_negative_weights_take_distributed_tier(spark):
    """Dijkstra's premise fails on negative weights: the local tier must
    decline and both paths still agree (Bellman-Ford handles it)."""
    from polars_grouper_spark.operators.shortest_path import (
        calculate_shortest_path,
    )

    edges = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "c", -0.5), ("a", "c", 3.0)],
        ["from", "to", "weight"],
    )
    loc = sorted(
        tuple(r)
        for r in calculate_shortest_path(edges, directed=True).collect()
    )
    dist = sorted(
        tuple(r)
        for r in calculate_shortest_path(
            edges, directed=True, max_local_edges=0
        ).collect()
    )
    assert loc == dist
    assert ("a", "c", 1.5) in loc


def test_dial_meter_trips_to_distributed(spark):
    """A starved gather meter must make the Dial tier return None and the
    operator fall back to the distributed loop with identical results —
    the bounded-wasted-work contract for cutoff queries whose ball
    volume exceeds the budget."""
    from polars_grouper_spark.operators.shortest_path import (
        _dial_local,
        calculate_shortest_path,
    )

    edges = spark.createDataFrame(
        [("a", "b", 0.5), ("b", "c", 0.5), ("c", "d", 0.5), ("a", "d", 2.0)],
        ["from", "to", "weight"],
    )
    # max_local_work=0 starves the scalar tier; max_local_bfs_work=1
    # starves the dial meter, so the distributed loop must run.
    starved = sorted(
        tuple(r)
        for r in calculate_shortest_path(
            edges,
            max_distance=1.5,
            max_local_work=0,
            max_local_bfs_work=1,
        ).collect()
    )
    reference = sorted(
        tuple(r)
        for r in calculate_shortest_path(
            edges, max_distance=1.5, max_local_edges=0
        ).collect()
    )
    assert starved == reference
    assert ("a", "c", 1.0) in reference

    # And the kernel itself reports the trip as None, not a partial result.
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "u": ["a", "b", "c", "a", "b", "c", "d", "d"],
            "v": ["b", "c", "d", "d", "a", "b", "c", "a"],
            "q": [500, 500, 500, 2000, 500, 500, 500, 2000],
        }
    )
    assert (
        _dial_local(pdf, ["a"], False, 1500, max_gather=1) is None
    )
