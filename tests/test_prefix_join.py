"""Longest-prefix join: longest wins, left/inner semantics, guards."""

import pytest

from polars_grouper_spark.operators.prefix_join import prefix_join


def _dim(spark, rules):
    return spark.createDataFrame([(r,) for r in rules], "rule string")


def test_longest_prefix_wins(spark):
    fact = spark.createDataFrame(
        [(1, "en/src3/a"), (2, "en/src9"), (3, "zz/other")],
        "id long, path string",
    )
    dim = _dim(spark, ["en/", "en/src3", "en/src3/a", "fr/"])
    got = {
        r["id"]: r["matched_prefix"]
        for r in prefix_join(fact, dim, "id", "path", "rule").collect()
    }
    assert got == {1: "en/src3/a", 2: "en/", 3: None}


def test_inner_drops_unmatched(spark):
    fact = spark.createDataFrame([(1, "a/b"), (2, "x/y")], "id long, path string")
    dim = _dim(spark, ["a/"])
    got = prefix_join(fact, dim, "id", "path", "rule", how="inner").collect()
    assert [(r["id"], r["matched_prefix"]) for r in got] == [(1, "a/")]


def test_empty_dim_and_null_prefixes(spark):
    fact = spark.createDataFrame([(1, "a/b")], "id long, path string")
    dim = spark.createDataFrame([(None,)], "rule string")
    got = prefix_join(fact, dim, "id", "path", "rule").collect()
    assert got[0]["matched_prefix"] is None
    assert prefix_join(fact, dim, "id", "path", "rule", how="inner").count() == 0


def test_length_cap_and_how_validation(spark):
    fact = spark.createDataFrame([(1, "abc")], "id long, path string")
    dim = _dim(spark, ["a" * i for i in range(1, 12)])
    with pytest.raises(ValueError, match="distinct prefix lengths"):
        prefix_join(fact, dim, "id", "path", "rule", max_lengths=5)
    with pytest.raises(ValueError, match="how"):
        prefix_join(fact, dim, "id", "path", "rule", how="full")


def test_exact_match_and_value_shorter_than_rules(spark):
    fact = spark.createDataFrame([(1, "ab")], "id long, path string")
    dim = _dim(spark, ["ab", "abcd"])  # longer rule can't match a short value
    got = prefix_join(fact, dim, "id", "path", "rule").collect()
    assert got[0]["matched_prefix"] == "ab"
