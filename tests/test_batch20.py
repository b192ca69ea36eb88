"""Round-5 batch 20: c-TF-IDF labeling."""

from __future__ import annotations

import math

import pytest

from polars_grouper_spark.functions.retrieval import ctfidf_terms


def test_ctfidf_characteristic_terms_win(spark):
    docs = [
        ("sports", "goal goal match team team team"),
        ("sports", "goal match referee"),
        ("finance", "market market stock stock stock bond"),
        ("finance", "market rates bond"),
        # 'the' everywhere -> low score despite high frequency
        ("sports", "the the the the"),
        ("finance", "the the the the"),
    ]
    df = spark.createDataFrame(docs, ["cls", "text"])
    out = {}
    for r in ctfidf_terms(df, "cls", "text", top_k=3, min_count=1).collect():
        out.setdefault(r['class'], []).append(r.term)
    assert "team" in out["sports"] and "goal" in out["sports"]
    assert "stock" in out["finance"] and "market" in out["finance"]
    assert "the" not in out["sports"] and "the" not in out["finance"]


def test_ctfidf_score_formula(spark):
    docs = [("a", "x x y"), ("b", "y z")]
    df = spark.createDataFrame(docs, ["cls", "text"])
    rows = {( r['class'], r.term): r for r in
            ctfidf_terms(df, "cls", "text", top_k=10, min_count=1).collect()}
    avg = 5 / 2  # 5 tokens, 2 classes
    want = round(2 * math.log(1.0 + avg / 2), 6)  # x: n=2, tf_all=2
    assert rows[("a", "x")].score == pytest.approx(want, abs=2e-6)
    assert rows[("a", "y")].n == 1 and rows[("b", "y")].n == 1


def test_ctfidf_min_count_filters(spark):
    df = spark.createDataFrame([("a", "common common rare")], ["cls", "text"])
    terms = {r.term for r in
             ctfidf_terms(df, "cls", "text", min_count=2).collect()}
    assert terms == {"common"}
