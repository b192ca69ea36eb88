"""Text retrieval over document tables: TF-IDF weights and BM25 ranking.

Classic sparse retrieval (Robertson & Spärck Jones; the BM25 variant is
the Okapi formulation) expressed as pure DataFrame algebra:

- term statistics are explode + two map-side-combinable aggregations
  (per-(doc, term) tf, per-term df) — the shuffles carry (id, term)
  pairs, never the corpus text;
- corpus-level scalars (N, avg doc length) travel as a one-row broadcast
  DataFrame, not literals, so the compiled plan is reusable across
  queries (see SCALE.md: changing literals defeat the codegen cache);
- scoring a query filters the postings to the query's terms *before* any
  aggregation — at 100 TB the scored row count is (query terms × docs
  containing them), not the corpus.

All math stays in whole-stage codegen; outputs are rounded well above
cross-engine libm noise so the DuckDB oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def term_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Postings: ``(id, term, tf, doc_len)`` — lowercased whitespace
    terms, one row per distinct (doc, term)."""
    staged = df.select(
        F.col(id_col).alias("id"),
        F.transform(tokens(F.col(text_col)), F.lower).alias("_toks"),
    )
    staged = staged.select("id", F.size("_toks").cast("long").alias("doc_len"), "_toks")
    from polars_grouper_spark.plans.iteration import truncate_lineage

    # The postings table is consumed by document-frequency aggregation
    # AND the scoring join in every caller — materialize once so the
    # corpus scan + explode never replays per consumer.
    return truncate_lineage(
        staged.select("id", "doc_len", F.explode("_toks").alias("term"))
        .groupBy("id", "doc_len", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Smoothed TF-IDF -> ``(id, term, tf, df, tfidf)``.

    ``tfidf = tf * (ln((N + 1) / (df + 1)) + 1)`` — the smoothed form
    (scikit-learn's default) that never zeroes a term appearing in every
    document.
    """
    terms = term_table(df, id_col, text_col)
    doc_freq = terms.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = df.select(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        terms.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            "tf",
            "df",
            (
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + F.lit(1.0))
            ).alias("tfidf"),
        )
    )


def bm25_score(
    df: DataFrame,
    query_terms: "list[str]",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 scores for every document matching >= 1 query term ->
    ``(id, n_hits, score)``.

    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avgdl))``
    with ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))``.  The postings
    are filtered to the query terms *before* the df/score aggregations,
    so cost scales with the terms' posting lists, not the corpus.
    """
    q = [t.lower() for t in query_terms]
    terms = term_table(df, id_col, text_col).where(F.col("term").isin(q))
    doc_freq = terms.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    stats = df.select(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg(F.size(tokens(F.col(text_col)))).alias("avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") + k1 * (1.0 - b + b * F.col("doc_len") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1.0) / norm
    return (
        terms.join(F.broadcast(doc_freq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.sum(contrib).alias("score"),
        )
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document unigram language-model score ->
    ``(id, n_tokens, avg_logprob, ppl)``.

    The corpus's own unigram distribution is the model (the CCNet-style
    self-scoring filter: documents whose tokens are improbable under the
    corpus LM are outliers — boilerplate, noise, wrong-language).

    ``avg_logprob = Σ_t tf·ln(p(t)) / Σ_t tf`` with
    ``p(t) = count(t) / total_tokens``; ``ppl = exp(−avg_logprob)``.

    Plan: postings (explode + partial-agg) ⋈ broadcast vocab-sized
    probability table, then a map-side-combinable per-doc aggregation —
    the corpus text itself is never shuffled.
    """
    terms = term_table(df, id_col, text_col)
    vocab = terms.groupBy("term").agg(F.sum("tf").cast("long").alias("n_term"))
    total = vocab.agg(F.sum("n_term").cast("long").alias("n_total"))
    probs = vocab.crossJoin(F.broadcast(total)).select(
        "term", F.log(F.col("n_term") / F.col("n_total")).alias("logp")
    )
    return (
        terms.join(F.broadcast(probs), "term")
        .groupBy("id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (F.sum(F.col("tf") * F.col("logp")) / F.sum("tf")).alias("avg_logprob"),
        )
        .select(
            "id",
            "n_tokens",
            "avg_logprob",
            F.exp(-F.col("avg_logprob")).alias("ppl"),
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: "list[str]",
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
) -> DataFrame:
    """Deterministic BM25 top-k -> ``(id, n_hits, score, rank)``: ranked
    by (rounded score desc, id) so ties — and sub-ulp cross-engine float
    noise — cannot reorder the cut."""
    scored = bm25_score(df, query_terms, id_col, text_col, k1, b).select(
        "id", "n_hits", F.round("score", round_digits).alias("score")
    )
    w = Window.orderBy(F.col("score").desc(), F.col("id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
    )
