"""k-truss decomposition — known-answer fixtures and peeling cascades."""

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.operators.ktruss import k_truss


def rows(df):
    return sorted(tuple(r) for r in df.select("src", "dst", "support").collect())


def test_ktruss_triangle_with_pendant(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], ["from", "to"]
    )
    assert rows(k_truss(edges, 3)) == [("a", "b", 1), ("a", "c", 1), ("b", "c", 1)]


def test_ktruss_k4(spark):
    """K4: every edge sits in 2 triangles — survives k=4, dies at k=5."""
    nodes = ["a", "b", "c", "d"]
    k4 = [(x, y) for x in nodes for y in nodes if x < y]
    edges = spark.createDataFrame(k4, ["from", "to"])
    out = rows(k_truss(edges, 4))
    assert len(out) == 6 and all(s == 2 for _, _, s in out)
    assert k_truss(edges, 5).count() == 0


def test_ktruss_k2_is_cleaned_graph(spark):
    """k=2 (min support 0) keeps every edge, support reported."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y")], ["from", "to"]
    )
    assert rows(k_truss(edges, 2)) == [
        ("a", "b", 1),
        ("a", "c", 1),
        ("b", "c", 1),
        ("x", "y", 0),
    ]


def test_ktruss_cascade(spark):
    """Two triangles sharing edge (a,b), plus a third triangle hanging on
    (c,d): k=3 keeps everything with >= 1 support; k=4 requires every
    edge in 2 triangles — only (a,b) has support 2, so the whole graph
    cascades away."""
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d"), ("c", "d")],
        ["from", "to"],
    )
    # this is K4 minus nothing... use a real cascade: bowtie
    bowtie = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"), ("e", "c")],
        ["from", "to"],
    )
    out = rows(k_truss(bowtie, 3))
    assert len(out) == 6 and all(s == 1 for _, _, s in out)
    assert k_truss(bowtie, 4).count() == 0


def test_ktruss_truss_inside_looser_graph(spark):
    """K4 with a pendant triangle chain: the 4-truss is exactly the K4
    (supports recomputed inside the truss), the chain peels in rounds."""
    nodes = ["a", "b", "c", "d"]
    k4 = [(x, y) for x in nodes for y in nodes if x < y]
    chain = [("d", "e"), ("e", "f"), ("f", "d"), ("f", "g"), ("g", "e")]
    edges = spark.createDataFrame(k4 + chain, ["from", "to"])
    out = rows(k_truss(edges, 4))
    assert {(s, d) for s, d, _ in out} == {
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")
    }
    assert all(s == 2 for _, _, s in out)


def test_ktruss_invalid_k(spark):
    edges = spark.createDataFrame([("a", "b")], ["from", "to"])
    with pytest.raises(ValueError, match="k must be >= 2"):
        k_truss(edges, 1)


@pytest.mark.slow
def test_ktruss_distributed_triangle_list_parity(spark):
    """r9-opt: the distributed tier peels a ONCE-enumerated triangle list
    (prune by the round's peeled-edge delta) instead of re-running the
    wedge pipeline per round.  Both prune sides (anti on the dead delta /
    semi on the survivors) and both enumeration regimes (broadcast /
    bitset-prefiltered sort-merge) must match the local tier exactly —
    including on multi-round cascades."""
    import random

    rnd = random.Random(11)
    nodes = ["a", "b", "c", "d"]
    k4 = [(x, y) for x in nodes for y in nodes if x < y]
    chain = [("d", "e"), ("e", "f"), ("f", "d"), ("f", "g"), ("g", "e")]
    graphs = [
        k4 + chain,  # multi-round cascade (anti-join prune path)
        [(f"n{rnd.randrange(15)}", f"n{rnd.randrange(15)}") for _ in range(80)],
    ]
    for es in graphs:
        edges = spark.createDataFrame(es, ["from", "to"])
        for k in (3, 4):
            base = rows(k_truss(edges, k))  # local tier = ground truth
            for mbe in (0, 2_000_000):  # bitset-prefilter / broadcast regime
                got = rows(
                    k_truss(
                        edges, k, max_local_edges=0, max_broadcast_edges=mbe
                    )
                )
                assert got == base, (k, mbe, es[:3])


def test_packed_bitset_prefilter_no_false_negatives(spark):
    """The membership pre-filter may pass extra rows (false positives are
    re-checked by the exact join downstream) but must NEVER drop a true
    member."""
    from pyspark.sql import functions as F

    from polars_grouper_spark.plans.runtime_filter import packed_bitset_prefilter

    keys = spark.range(500).select(
        (F.col("id") * 3).alias("a"), (F.col("id") * 7 + 1).alias("b")
    )
    filt = packed_bitset_prefilter(keys, ["a", "b"], 500)
    assert filt is not None
    probe = spark.range(5000).select(
        (F.col("id")).alias("x"), (F.col("id") * 2).alias("y")
    ).unionAll(keys.select(F.col("a").alias("x"), F.col("b").alias("y")))
    kept = {(r["x"], r["y"]) for r in filt(probe, ["x", "y"]).collect()}
    members = {(r["a"], r["b"]) for r in keys.collect()}
    assert members <= kept  # every true member survives
    # and the filter is actually selective on this shape
    assert len(kept) < 5500


def test_ktruss_subset_of_kcore(spark):
    """Every k-truss lives inside a (k-1)-core (Cohen 2008)."""
    from polars_grouper_spark.operators.kcore import k_core

    import random

    rnd = random.Random(7)
    edges = spark.createDataFrame(
        [(f"n{rnd.randrange(12)}", f"n{rnd.randrange(12)}") for _ in range(60)],
        ["from", "to"],
    )
    truss_nodes = {
        x
        for r in k_truss(edges, 4).collect()
        for x in (r["src"], r["dst"])
    }
    core_nodes = {r["node"] for r in k_core(edges, 3).collect()}
    assert truss_nodes <= core_nodes
