"""Round-5 batch 17: dataset fingerprint, 2-hop redundancy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.profile import dataset_fingerprint
from polars_grouper_spark.operators.toposort import redundant_edges_2hop


def test_fingerprint_order_free_and_change_sensitive(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], ["k", "s"])
    b = spark.createDataFrame([(3, "z"), (1, "x"), (2, "y")], ["k", "s"])
    fa = dataset_fingerprint(a, ["k", "s"]).collect()[0]
    fb = dataset_fingerprint(b.repartition(3), ["k", "s"]).collect()[0]
    assert (fa.n_rows, fa.xor_hash) == (fb.n_rows, fb.xor_hash)
    c = spark.createDataFrame([(1, "x"), (2, "y"), (3, "Z")], ["k", "s"])
    fc = dataset_fingerprint(c, ["k", "s"]).collect()[0]
    assert fc.xor_hash != fa.xor_hash


def test_fingerprint_null_vs_empty_distinct(spark):
    a = spark.createDataFrame([(1, None)], "k int, s string")
    b = spark.createDataFrame([(1, "")], "k int, s string")
    fa = dataset_fingerprint(a, ["k", "s"]).collect()[0]
    fb = dataset_fingerprint(b, ["k", "s"]).collect()[0]
    assert fa.xor_hash != fb.xor_hash


def test_fingerprint_rejects_floats_and_missing(spark):
    df = spark.createDataFrame([(1, 2.0)], ["k", "v"])
    with pytest.raises(ValueError, match="decimal"):
        dataset_fingerprint(df, ["k", "v"])
    with pytest.raises(ValueError, match="no such column"):
        dataset_fingerprint(df, ["nope"])
    with pytest.raises(ValueError):
        dataset_fingerprint(df, [])


def test_redundant_edges_detects_shortcut(spark):
    # a->b->c plus shortcut a->c (redundant); d->e not redundant
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("d", "e")], ["from", "to"]
    )
    out = {(r.src, r.dst): r.via_count
           for r in redundant_edges_2hop(df).collect()}
    assert out == {("a", "c"): 1}


def test_redundant_edges_counts_witnesses(spark):
    # two middles both witness a->d
    df = spark.createDataFrame(
        [("a", "b"), ("b", "d"), ("a", "c"), ("c", "d"), ("a", "d")],
        ["from", "to"],
    )
    out = {(r.src, r.dst): r.via_count
           for r in redundant_edges_2hop(df).collect()}
    assert out == {("a", "d"): 2}
