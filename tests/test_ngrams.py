"""Word n-gram extraction and corpus top-k — known answers, edge cases,
DuckDB parity."""

import duckdb

from polars_grouper_spark.functions.text import ngrams, top_ngrams, top_ngrams_sql


def test_ngrams_column_basic(spark):
    df = spark.createDataFrame([("The quick brown Fox",)], ["text"])
    got = df.select(ngrams("text", 2).alias("g")).collect()[0]["g"]
    assert got == ["the quick", "quick brown", "brown fox"]


def test_ngrams_short_and_empty_docs(spark):
    df = spark.createDataFrame([("one",), ("",), ("   ",)], ["text"])
    got = [r["g"] for r in df.select(ngrams("text", 2).alias("g")).collect()]
    assert got == [[], [], []]


def test_ngrams_unigram_is_tokens(spark):
    df = spark.createDataFrame([("A  b\tC",)], ["text"])
    got = df.select(ngrams("text", 1).alias("g")).collect()[0]["g"]
    assert got == ["a", "b", "c"]


def test_top_ngrams_counts_and_order(spark):
    df = spark.createDataFrame(
        [("a b c a b",), ("b c d",), ("x",), (" ",)], ["text"]
    )
    got = [tuple(r) for r in top_ngrams(df, n=2, k=50).collect()]
    # ordered by (occurrences desc, ngram)
    assert got == [
        ("a b", 1, 2),
        ("b c", 2, 2),
        ("c a", 1, 1),
        ("c d", 1, 1),
    ]


def test_top_ngrams_duckdb_parity(spark):
    texts = [
        ("the cat sat on the mat",),
        ("the cat ran",),
        ("on the mat the cat sat",),
        ("",),
        ("single",),
    ]
    df = spark.createDataFrame(texts, ["text"])
    got = [tuple(r) for r in top_ngrams(df, n=3, k=10).collect()]
    con = duckdb.connect()
    vals = ",".join(f"('{t}')" for (t,) in texts)
    con.sql(f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) t(text)")
    want = con.sql(top_ngrams_sql(n=3, k=10)).fetchall()
    assert got == [tuple(r) for r in want]
