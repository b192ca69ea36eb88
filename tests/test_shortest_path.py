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
