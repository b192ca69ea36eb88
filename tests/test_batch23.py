"""Round-5 batch 23: count-cosine pairs, schema evolution."""

from __future__ import annotations

import math

import pytest

from polars_grouper_spark.functions.retrieval import count_cosine_pairs


def test_cosine_pairs_exact_values(spark):
    docs = [
        (1, "apple banana apple"),       # apple:2 banana:1
        (2, "apple banana banana"),      # apple:1 banana:2
        (3, "cherry date"),              # disjoint
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {(r.id_a, r.id_b): r for r in
           count_cosine_pairs(df, min_cos=0.1, max_df=10).collect()}
    # dot = 2*1 + 1*2 = 4; norms = sqrt(5) each
    assert set(out) == {(1, 2)}
    assert out[(1, 2)].dot == 4
    assert out[(1, 2)].cos == pytest.approx(round(4 / 5, 6), abs=2e-6)


def test_cosine_pairs_df_cap_blocks_stopword_candidates(spark):
    # 'the' is in every doc (df=3 > max_df=2): without it docs 1/2
    # share nothing -> no pair
    docs = [(1, "the alpha"), (2, "the beta"), (3, "the gamma")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    assert count_cosine_pairs(df, min_cos=0.01, max_df=2).count() == 0


def test_cosine_pairs_norms_use_all_terms(spark):
    # shared rare term 'x' (df=2, kept); 'the' (df=3) is df-capped out
    # of candidate generation but must still count in the norms
    docs = [(1, "x the"), (2, "x the"), (3, "the")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = count_cosine_pairs(df, min_cos=0.01, max_df=2).collect()
    assert len(out) == 1 and (out[0].id_a, out[0].id_b) == (1, 2)
    # vectors {x:1, the:1} each -> dot 1, norms sqrt(2): cos = 0.5
    assert out[0].cos == pytest.approx(0.5, abs=2e-6)


def test_schema_evolution_merge(spark, tmp_path):
    old = spark.createDataFrame([(1, "a")], ["k", "s"])
    new = spark.createDataFrame([(2, "b", 9.0)], ["k", "s", "extra"])
    old.write.parquet(str(tmp_path / "v=1"))
    new.write.parquet(str(tmp_path / "v=2"))
    back = spark.read.option("mergeSchema", "true").parquet(str(tmp_path))
    rows = {r.k: r for r in back.collect()}
    assert rows[1].extra is None and rows[2].extra == 9.0
    assert set(back.columns) >= {"k", "s", "extra"}
