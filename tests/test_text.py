from polars_grouper_spark.functions import text as tx
from pyspark.sql import functions as F


def _docs(spark):
    rows = [
        (0, "The cat and the dog ran to the house, and it was fast."),
        (1, "Der Hund und die Katze sind nicht mit der Maus."),
        (2, "12345 67890 !!! ??? 000"),
        (3, ""),
        (4, "le chat et le chien est pour la maison"),
    ]
    return spark.createDataFrame(rows, schema="doc_id long, text string").coalesce(1)


def test_text_stats(spark):
    out = {r["doc_id"]: r for r in tx.text_stats(_docs(spark)).collect()}
    assert out[0]["n_tokens"] == 13
    assert out[3]["n_tokens"] == 0 and out[3]["punct_ratio"] == 0.0
    assert out[2]["digit_ratio"] > 0.5
    assert 0 < out[0]["stopword_ratio"] < 1


def test_quality_score_bounds(spark):
    rows = tx.quality_score(_docs(spark)).collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
    scores = {r["doc_id"]: r["quality_score"] for r in rows}
    assert scores[0] > scores[2]  # prose beats digit soup


def test_language_id(spark):
    out = {r["doc_id"]: r["lang_pred"] for r in tx.language_id(_docs(spark)).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[4] == "fr"
    assert out[2] == "und"
    assert out[3] == "und"


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(0, "Hello,   World!"), (1, "hello world"), (2, "different text")],
        schema="doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in tx.fingerprint(df).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]


def test_token_counts(spark):
    df = _docs(spark).select("doc_id", tx.token_count("text").alias("n"),
                             tx.bpe_ish_token_count("text").alias("b"))
    out = {r["doc_id"]: (r["n"], r["b"]) for r in df.collect()}
    assert out[0][0] == 13
    assert out[0][1] >= out[0][0]  # sub-word splits >= whitespace tokens
    assert out[3] == (0, 0)


def test_enrich_documents_matches_composed_operators(spark):
    """The fused one-scan enrichment must equal joining language_id +
    quality_score + token counts EXACTLY (same expressions, same float
    arithmetic), and its plan must read the corpus once."""
    from polars_grouper_spark.functions import text as tx
    from polars_grouper_spark.sources import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    fused = {r["doc_id"]: r for r in tx.enrich_documents(docs).collect()}

    lang = {r["doc_id"]: r for r in tx.language_id(docs).collect()}
    qual = {r["doc_id"]: r for r in tx.quality_score(docs).collect()}
    toks = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            tx.token_count("text").cast("long").alias("ws"),
            tx.bpe_ish_token_count("text").cast("long").alias("bpe"),
        ).collect()
    }
    assert fused.keys() == lang.keys()
    for k, f in fused.items():
        assert f["lang_pred"] == lang[k]["lang_pred"]
        assert f["lang_hits"] == lang[k]["lang_hits"]
        assert f["quality_score"] == qual[k]["quality_score"]  # bit-exact
        assert f["n_ws_tokens"] == toks[k]["ws"]
        assert f["n_bpe_tokens"] == toks[k]["bpe"]

    plan = tx.enrich_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_pipeline_prep_reads_corpus_at_most_twice(spark):
    """The composed prep query: enrichment scan + dedup group scan,
    nothing more (the naive operator-join version scans documents four
    times)."""
    import __spark_entry__ as entry_mod

    out = entry_mod.q_pipeline_prep(spark, "/root/testdata/sf0.001")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 2
    assert out.count() >= 1


def test_vocab_coverage_hand_computed(spark):
    from polars_grouper_spark.functions.text import vocab_coverage

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b z")], ["doc_id", "text"]
    )
    got = {r["rank"]: r for r in vocab_coverage(df, k=3).collect()}
    # counts: a=4, b=3, c=1, z=1 (ties by token: c before z); total=9
    assert (got[1]["token"], got[1]["cnt"]) == ("a", 4)
    assert (got[2]["token"], got[2]["cnt"]) == ("b", 3)
    assert got[3]["token"] == "c"
    assert abs(got[1]["cum_share"] - round(4 / 9, 9)) < 1e-12
    assert abs(got[3]["cum_share"] - round(8 / 9, 9)) < 1e-12


def test_pmi_collocation_beats_chance(spark):
    from polars_grouper_spark.functions.text import pmi_pairs

    # 'strong glue' always adjacent; 'the' everywhere (low association)
    docs = [(i, "the strong glue the filler the strong glue the mix") for i in range(10)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r["tok_a"], r["tok_b"]): r["pmi"] for r in
           pmi_pairs(df, min_count=5, top_k=10).collect()}
    assert ("strong", "glue") in got
    assert got[("strong", "glue")] > got.get(("the", "strong"), -99)


def test_pmi_duckdb_parity(spark):
    import duckdb

    from polars_grouper_spark.functions.text import pmi_pairs, pmi_pairs_sql

    words = ["alpha", "beta", "gamma", "delta"]
    docs = [(i, " ".join(words[(i + j) % 4] for j in range(12))) for i in range(20)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = sorted(tuple(r) for r in pmi_pairs(df, min_count=3, top_k=8).collect())
    vals = ",".join(f"({i}, '{t}')" for i, t in docs)
    sql = pmi_pairs_sql(
        f"(SELECT * FROM (VALUES {vals}) v(doc_id, text))", "text",
        min_count=3, top_k=8,
    )
    want = sorted(duckdb.sql(sql).fetchall())
    assert got == want
