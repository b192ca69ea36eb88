"""Round-5 batch 12: ANOVA, edge embeddedness, k-fold audit."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.experiment import anova_oneway
from polars_grouper_spark.operators.triangles import edge_embeddedness


def _brute_anova(groups):
    all_v = [v for vs in groups.values() for v in vs]
    n, k = len(all_v), len(groups)
    mean = sum(all_v) / n
    ssb = sum(len(vs) * (sum(vs) / len(vs) - mean) ** 2 for vs in groups.values())
    sst = sum((v - mean) ** 2 for v in all_v)
    ssw = sst - ssb
    return (ssb / (k - 1)) / (ssw / (n - k)), ssb / sst


@pytest.mark.parametrize("seed", [1, 2])
def test_anova_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    groups = {
        "a": [rng.randint(0, 100) / 10.0 for _ in range(50)],
        "b": [rng.randint(20, 120) / 10.0 for _ in range(60)],
        "c": [rng.randint(40, 140) / 10.0 for _ in range(40)],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = anova_oneway(df, "g", "v", quant=10).collect()[0]
    f, eta2 = _brute_anova(groups)
    assert r.k == 3 and r.n == 150
    assert r.f == pytest.approx(f, rel=1e-5)
    assert r.eta2 == pytest.approx(eta2, rel=1e-5)


def test_anova_degenerate_nulls(spark):
    # one group only -> F undefined
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], ["g", "v"])
    r = anova_oneway(df, "g", "v").collect()[0]
    assert r.f is None and r.eta2 is None and r.k == 1


def test_embeddedness_triangle_plus_bridge(spark):
    # triangle a-b-c plus bridge c-d: triangle edges have 1 common
    # neighbor; the bridge has 0 (a weak tie).
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")], ["from", "to"]
    )
    out = {(r.a, r.b): r for r in edge_embeddedness(df).collect()}
    assert out[("a", "b")].n_common == 1
    assert out[("c", "d")].n_common == 0 and out[("c", "d")].strength == 0.0
    # ("a","b"): N(a)={b,c}, N(b)={a,c} -> union\{a,b}={c}, common={c}
    assert out[("a", "b")].strength == pytest.approx(1.0)
    # ("b","c"): deg(b)=2, deg(c)=3 -> union size 2+3-2-1=2, strength 1/2
    assert out[("b", "c")].strength == pytest.approx(0.5)


def test_embeddedness_k4_fully_embedded(spark):
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    df = spark.createDataFrame(edges, ["from", "to"])
    for r in edge_embeddedness(df).collect():
        assert r.n_common == 2 and r.strength == pytest.approx(1.0)


def test_kfold_assignment_is_stable_and_partitions(spark):
    from polars_grouper_spark.functions.experiment import assign_variant

    df = spark.range(1000)
    a = df.select("id", assign_variant("id", "kfold", n_variants=5).alias("f"))
    b = df.repartition(7).select(
        "id", assign_variant("id", "kfold", n_variants=5).alias("f")
    )
    assert a.subtract(b).count() == 0  # partitioning-independent
    sizes = {r.f: r.n for r in a.groupBy("f").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == {0, 1, 2, 3, 4}
    assert sum(sizes.values()) == 1000
