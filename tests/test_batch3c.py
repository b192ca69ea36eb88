"""Round-5 batch 3c: group MinHash similarity, A/B test."""

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.dedup import group_minhash_similarity
from polars_grouper_spark.functions.experiment import ab_test, assign_variant


def test_group_similarity_identical_groups_are_1(spark):
    docs = [
        ("s1", "the quick brown fox jumps over the lazy dog again and again"),
        ("s2", "the quick brown fox jumps over the lazy dog again and again"),
        ("s3", "completely different vocabulary about spark distributed joins"),
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {
        (r["group_a"], r["group_b"]): r["est_jaccard"]
        for r in group_minhash_similarity(df, "source", "text").collect()
    }
    assert got[("s1", "s2")] == 1.0
    assert got[("s1", "s3")] < 0.3
    assert len(got) == 3  # all pairs


def test_group_similarity_is_union_level(spark):
    # Group g1 = {docA, docB}; group g2 = one doc equal to A+B's text —
    # union-homomorphism means signatures match exactly.
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "iota kappa lambda mu nu xi omicron pi"
    df = spark.createDataFrame(
        [("g1", a), ("g1", b), ("g2", a), ("g2", b)],
        "source string, text string",
    )
    got = group_minhash_similarity(df, "source", "text").collect()
    assert len(got) == 1 and got[0]["est_jaccard"] == 1.0


def test_assign_variant_stable_and_balanced(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "u long")
    v = df.select(assign_variant("u", "s").alias("v"))
    counts = {r["v"]: r["n"] for r in v.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {0, 1}
    assert abs(counts[0] - counts[1]) < 200  # ~50/50
    again = df.select(assign_variant("u", "s").alias("v"))
    assert v.exceptAll(again).count() == 0  # deterministic
    with pytest.raises(ValueError):
        assign_variant("u", n_variants=1)


def test_ab_test_aa_is_insignificant_and_planted_effect_found(spark):
    # A/A: identical behavior in both arms -> |z| small.
    rows = [(i, "purchase" if i % 10 == 0 else "view") for i in range(3000)]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    aa = ab_test(df, "user_id", F.col("event_type") == "purchase").collect()[0]
    assert aa["n_a"] + aa["n_b"] == 3000
    assert abs(aa["z"]) < 2.5
    # Planted effect: convert ONLY variant-0 users at a high rate.
    va = df.select(
        "user_id", assign_variant("user_id", "exp").alias("v")
    )
    rows2 = va.select(
        "user_id",
        F.when(F.col("v") == 0, F.lit("purchase")).otherwise(F.lit("view")).alias(
            "event_type"
        ),
    )
    eff = ab_test(rows2, "user_id", F.col("event_type") == "purchase").collect()[0]
    assert eff["significant"] is True and eff["z"] > 10


def test_ab_test_zero_se_yields_null_z(spark):
    # Everyone converts -> pooled p = 1 -> se = 0 -> z NULL, not NaN.
    df = spark.createDataFrame(
        [(i, "purchase") for i in range(100)], "user_id long, event_type string"
    )
    r = ab_test(df, "user_id", F.col("event_type") == "purchase").collect()[0]
    assert r["z"] is None and r["significant"] is False
