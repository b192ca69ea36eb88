"""Round-5 batch 18: bow-tie decomposition, percolation curve."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.operators.scc import bowtie_decomposition


def test_bowtie_textbook_shape(spark):
    # IN: i1 -> core; core: a <-> b <-> c cycle; OUT: core -> o1 -> o2;
    # disconnected: x -> y
    edges = [
        ("i1", "a"),
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("c", "o1"), ("o1", "o2"),
        ("x", "y"),
    ]
    df = spark.createDataFrame(edges, ["from", "to"])
    out = {r.node: r.region for r in bowtie_decomposition(df).collect()}
    assert out["a"] == out["b"] == out["c"] == "SCC"
    assert out["i1"] == "IN"
    assert out["o1"] == "OUT" and out["o2"] == "OUT"
    assert out["x"] == "OTHER" and out["y"] == "OTHER"


def test_bowtie_tendril_is_other(spark):
    # t hangs off IN (reaches IN but not the core)
    edges = [
        ("a", "b"), ("b", "a"),          # core (2-cycle)
        ("i1", "a"),                      # IN
        ("i1", "t"),                      # tendril from IN, avoids core
    ]
    df = spark.createDataFrame(edges, ["from", "to"])
    out = {r.node: r.region for r in bowtie_decomposition(df).collect()}
    assert out["i1"] == "IN" and out["t"] == "OTHER"


def test_bowtie_all_one_scc(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["from", "to"]
    )
    out = {r.node: r.region for r in bowtie_decomposition(df).collect()}
    assert set(out.values()) == {"SCC"}


def test_percolation_monotone_on_fixture(spark):
    import __spark_entry__ as em

    rows = {r.k: r for r in
            em.queries()["percolation_sp"](
                spark, "/root/testdata/sf0.001"
            ).collect()}
    assert rows[1].n_edges < rows[2].n_edges < rows[4].n_edges
    assert rows[1].giant_frac <= rows[2].giant_frac <= rows[4].giant_frac
    assert 0.0 < rows[4].giant_frac <= 1.0


def test_percolation_tiers_identical(spark, monkeypatch):
    """Local union-find tier == the incremental-CC composition path
    (forced by zeroing the pair-list guard) on the same real data."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    loc = sorted(tuple(r) for r in em.queries()["percolation_sp"](spark, sf).collect())
    monkeypatch.setattr(em, "_PERC_LOCAL_MAX_EDGES", 0)
    dist = sorted(tuple(r) for r in em.queries()["percolation_sp"](spark, sf).collect())
    assert loc == dist
