"""Round-5 batch 16: winnowing, Neyman allocation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.dedup import winnow_fingerprints
from polars_grouper_spark.functions.sampling import neyman_allocation


def test_winnow_shared_substring_shares_fingerprint(spark):
    # docs share a 32-char run >= w+k-1 = 11 -> fingerprint sets overlap
    shared = "the quick brown fox jumps over!!"
    docs = [
        (1, "XXXX" + shared + "YYYYYYYY"),
        (2, "completely different prefix " + shared),
        (3, "no overlap here at all, none whatsoever.."),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from pyspark.sql import Window
    from polars_grouper_spark.functions.hashing import portable_hash64

    # recompute per-doc selected SETS to check overlap directly
    src = df.select(F.col("doc_id").alias("doc"), F.col("text").alias("_t"))
    k, w = 8, 4
    grams = src.select(
        "doc",
        F.posexplode(F.sequence(F.lit(1), F.length("_t") - F.lit(k) + 1)).alias("_", "pos"),
        "_t",
    ).select("doc", "pos", portable_hash64(F.substring("_t", F.col("pos"), k)).alias("h"))
    win = Window.partitionBy("doc").orderBy("pos").rowsBetween(0, w - 1)
    cnt = Window.partitionBy("doc")
    sel = (
        grams.select("doc", "pos", F.min("h").over(win).alias("wm"),
                     F.count(F.lit(1)).over(cnt).alias("n"))
        .where(F.col("pos") <= F.col("n") - w + 1)
        .select("doc", "wm").distinct().collect()
    )
    sets = {}
    for r in sel:
        sets.setdefault(r.doc, set()).add(r.wm)
    assert sets[1] & sets[2], "shared substring must share a fingerprint"
    assert not (sets[1] & sets[3] and sets[2] & sets[3])
    # the operator's summary agrees with the recomputed sets
    out = {r.doc_id: r for r in winnow_fingerprints(df, k=k, w=w).collect()}
    for d, s in sets.items():
        assert out[d].n_fingerprints == len(s)


def test_winnow_short_docs_dropped(spark):
    df = spark.createDataFrame([(1, "short")], ["doc_id", "text"])
    assert winnow_fingerprints(df, k=8, w=4).count() == 0


def test_winnow_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "x" * 50)], ["doc_id", "text"])
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=1)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, w=0)


def test_neyman_prefers_big_noisy_strata(spark):
    rows = (
        # stratum A: large and noisy
        [("A", float(v)) for v in range(0, 1000, 1)]
        # stratum B: large but constant
        + [("B", 50.0)] * 1000
        # stratum C: tiny and noisy
        + [("C", float(v * 100)) for v in range(10)]
    )
    df = spark.createDataFrame(rows, ["s", "v"])
    out = {r.stratum: r for r in
           neyman_allocation(df, "s", "v", budget=500, quant=10).collect()}
    assert out["B"].alloc == 0  # zero variance draws nothing
    assert out["A"].alloc > out["C"].alloc  # N_h * S_h dominates
    assert out["C"].alloc <= out["C"].n_rows  # capped at stratum size
    assert sum(r.alloc for r in out.values()) <= 500


def test_neyman_single_row_stratum_zero_std(spark):
    df = spark.createDataFrame([("a", 1.0), ("b", 5.0), ("b", 9.0)], ["s", "v"])
    out = {r.stratum: r for r in
           neyman_allocation(df, "s", "v", budget=10).collect()}
    assert out["a"].std == 0.0 and out["a"].alloc == 0
    assert out["b"].alloc == 2  # capped at n_rows
