"""Greedy maximum-coverage selection."""

import pytest

from polars_grouper_spark.functions.selection import greedy_coverage


def _pairs(spark, rows):
    return spark.createDataFrame(rows, ["id", "el"])


def test_greedy_order_and_gains(spark):
    # d1 covers {a,b,c}, d2 covers {a,b}, d3 covers {d}.
    rows = [("d1", e) for e in "abc"] + [("d2", e) for e in "ab"] + [("d3", "d")]
    picks = greedy_coverage(_pairs(spark, rows), "id", "el", 5)
    # d1 first (gain 3), then d3 (gain 1); d2 adds nothing -> stops.
    assert picks == [(1, "d1", 3), (2, "d3", 1)]


def test_tie_breaks_on_min_id(spark):
    rows = [("b", "x"), ("a", "y")]
    picks = greedy_coverage(_pairs(spark, rows), "id", "el", 2)
    assert picks[0][1] == "a"


def test_duplicates_and_nulls(spark):
    rows = [("d", "x"), ("d", "x"), ("d", None), (None, "z")]
    picks = greedy_coverage(_pairs(spark, rows), "id", "el", 3)
    assert picks == [(1, "d", 1)]


def test_k_bounds_selection(spark):
    rows = [(f"d{i}", f"e{i}") for i in range(6)]
    picks = greedy_coverage(_pairs(spark, rows), "id", "el", 3)
    assert len(picks) == 3
    assert [p[0] for p in picks] == [1, 2, 3]


def test_validation(spark):
    with pytest.raises(ValueError):
        greedy_coverage(_pairs(spark, [("d", "x")]), "id", "el", 0)
