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


def phrase_match(
    df: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    case_insensitive: bool = True,
) -> DataFrame:
    """Exact token-boundary phrase search -> ``(id, n_matches)`` for
    documents containing the phrase's tokens CONSECUTIVELY (what
    ``LIKE '%...%'`` cannot promise: no substring false positives like
    'art' in 'artifact', no cross-token matches).

    Plan: one tokenize + posexplode of the corpus produces the
    positional postings ONCE; the phrase's first token filters the
    postings (predicate on the token value — at 100 TB this is the
    posting-list seek, a tiny fraction of the corpus), and each further
    phrase token is an equality semi-join on ``(doc, position + i)``
    against the same postings — k-1 broadcast-able joins for a k-token
    phrase, never a regex scan of full texts.  Match positions are
    counted per document.
    """
    toks = [t.lower() if case_insensitive else t for t in phrase.split()]
    if not toks:
        raise ValueError("phrase must contain at least one token")
    tok_col = tokens(F.col(text_col))
    if case_insensitive:
        tok_col = F.transform(tok_col, F.lower)
    postings = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tok_col).alias("pos", "tok"),
    )
    starts = postings.where(F.col("tok") == toks[0]).select("id", "pos")
    for i, t in enumerate(toks[1:], start=1):
        nxt = postings.where(F.col("tok") == t).select(
            "id", (F.col("pos") - i).alias("pos")
        )
        starts = starts.join(nxt, ["id", "pos"], "left_semi")
    return starts.groupBy("id").agg(F.count(F.lit(1)).alias("n_matches"))


def phrase_match_sql(
    rel_sql: str,
    phrase: str,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    *,
    case_insensitive: bool = True,
) -> str:
    """DuckDB oracle for :func:`phrase_match` (same postings join)."""
    toks = [t.lower() if case_insensitive else t for t in phrase.split()]
    tok = "lower(tok)" if case_insensitive else "tok"
    joins = []
    for i, t in enumerate(toks[1:], start=1):
        joins.append(
            f"JOIN postings p{i} ON p{i}.id = p0.id "
            f"AND p{i}.pos = p0.pos + {i} AND p{i}.tok = '{t}'"
        )
    return f"""
WITH raw AS (
  SELECT {id_expr} AS id,
         list_filter(string_split_regex(trim({text_expr}), '\\s+'),
                     x -> x <> '') AS toks
  FROM ({rel_sql})
), postings AS (
  SELECT id, generate_subscripts(toks, 1) - 1 AS pos,
         {tok.replace('tok', 'unnest(toks)')} AS tok
  FROM raw
)
SELECT p0.id, COUNT(*) AS n_matches
FROM postings p0 {' '.join(joins)}
WHERE p0.tok = '{toks[0]}'
GROUP BY p0.id
"""


def ctfidf_terms(
    df: DataFrame,
    class_col: str,
    text_col: str = "text",
    *,
    top_k: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Class-based TF-IDF (c-TF-IDF, the BERTopic cluster labeler) ->
    top-``top_k`` ``(class, term, n, score)`` per class: what words
    CHARACTERIZE each cluster/class, not just occur in it.

    score(t, c) = tf(t, c) · ln(1 + A / tf(t)) with tf(t, c) the term's
    count in the class, tf(t) its corpus count, and A the average
    per-class token total — high when a term is frequent in the class
    but rare overall.  Two count aggregations (class-term, term) plus a
    1-row average; the ln argument is a ratio of exact integers (A kept
    as an exact rational via n_tokens/n_classes), score rounds to 6.
    The cut is (rounded score desc, term) per class — total order, no
    float ties."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    from pyspark.sql import Window

    from .text import tokens

    toks = df.where(
        F.col(class_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(class_col).cast("string").alias("cls"),
        F.explode(F.transform(tokens(F.col(text_col)), F.lower)).alias(
            "term"
        ),
    )
    ct = toks.groupBy("cls", "term").agg(F.count(F.lit(1)).alias("n"))
    tot = toks.groupBy("term").agg(F.sum(F.lit(1)).alias("tf_all"))
    tot = tot.where(F.col("tf_all") >= min_count)
    avg_row = toks.agg(
        (
            F.count(F.lit(1)).cast("double")
            / F.countDistinct("cls")
        ).alias("_avg")
    )
    scored = (
        ct.join(tot, "term")
        .crossJoin(F.broadcast(avg_row))
        .select(
            "cls",
            "term",
            "n",
            F.round(
                F.col("n")
                * F.log(F.lit(1.0) + F.col("_avg") / F.col("tf_all")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("cls").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= top_k)
        .select(F.col("cls").alias("class"), "term", "n", "score")
    )


def ctfidf_terms_sql(
    table: str,
    class_expr: str,
    text_col: str = "text",
    *,
    top_k: int = 5,
    min_count: int = 2,
) -> str:
    """DuckDB oracle for :func:`ctfidf_terms`."""
    return f"""
WITH toks AS (
  SELECT CAST({class_expr} AS VARCHAR) AS cls, lower(u.tok) AS term
  FROM {table},
       unnest(CASE WHEN trim({text_col}) = '' THEN []
                   ELSE regexp_split_to_array(trim({text_col}), '\\s+')
              END) AS u(tok)
  WHERE {class_expr} IS NOT NULL AND {text_col} IS NOT NULL
),
ct AS (SELECT cls, term, count(*) AS n FROM toks GROUP BY 1, 2),
tot AS (
  SELECT term, count(*) AS tf_all FROM toks GROUP BY term
  HAVING count(*) >= {min_count}
),
avg_row AS (
  SELECT CAST(count(*) AS DOUBLE) / count(DISTINCT cls) AS a FROM toks
),
scored AS (
  SELECT cls, term, n,
         round(n * ln(1.0 + a / tf_all), 6) AS score
  FROM ct JOIN tot USING (term) CROSS JOIN avg_row
)
SELECT cls AS class, term, n, score FROM (
  SELECT *, row_number() OVER (PARTITION BY cls
         ORDER BY score DESC, term) AS rk
  FROM scored
) WHERE rk <= {top_k}
"""


def count_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_cos: float = 0.5,
    max_df: int = 200,
    top_k: int = 50,
) -> DataFrame:
    """Pairwise document cosine over COUNT vectors -> top-``top_k``
    ``(id_a, id_b, dot, cos)`` pairs with cos >= ``min_cos`` — the
    Elsayed/Lin/Oard pairwise-similarity pattern: candidates come ONLY
    from an inverted-index self-join on shared terms, with terms of
    document frequency above ``max_df`` dropped from candidate
    GENERATION (a stop-word's postings list is the quadratic blowup;
    dropping it bounds the join at the cost of missing pairs similar
    ONLY through ubiquitous terms — the standard trade, stated).

    Exactness: dot products and squared norms are integer sums over
    term counts, so cos = dot / (|a|·|b|) divides exact numbers and
    the threshold/top-k cut (rounded cos desc, id pair) cannot drift
    between engines.  Norms use ALL terms (only candidate generation
    is df-capped), so reported cosines are true cosines."""
    if not 0 < min_cos <= 1:
        raise ValueError(f"min_cos must be in (0, 1], got {min_cos}")
    from pyspark.sql import Window  # noqa: F401

    from .text import tokens

    toks = df.where(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(id_col).cast("long").alias("doc"),
        F.explode(F.transform(tokens(F.col(text_col)), F.lower)).alias(
            "term"
        ),
    )
    tf = toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    norms = tf.groupBy("doc").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("_n2")
    )
    rare = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df")).where(
        F.col("_df") <= max_df
    )
    post = tf.join(rare.select("term"), "term")
    a = post.select("term", F.col("doc").alias("id_a"), F.col("tf").alias("_ta"))
    b = post.select("term", F.col("doc").alias("id_b"), F.col("tf").alias("_tb"))
    dots = (
        a.join(b, "term")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("_ta") * F.col("_tb")).alias("dot"))
    )
    na = norms.select(F.col("doc").alias("id_a"), F.col("_n2").alias("_na"))
    nb = norms.select(F.col("doc").alias("id_b"), F.col("_n2").alias("_nb"))
    cos = F.col("dot") / (
        F.sqrt(F.col("_na").cast("double"))
        * F.sqrt(F.col("_nb").cast("double"))
    )
    scored = (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", "dot", F.round(cos, 6).alias("cos"))
        .where(F.col("cos") >= min_cos)
    )
    return (
        scored.orderBy(F.col("cos").desc(), "id_a", "id_b")
        .limit(top_k)
    )


def count_cosine_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_cos: float = 0.5,
    max_df: int = 200,
    top_k: int = 50,
) -> str:
    """DuckDB oracle for :func:`count_cosine_pairs`."""
    return f"""
WITH toks AS (
  SELECT CAST({id_col} AS BIGINT) AS doc, lower(u.tok) AS term
  FROM {table},
       unnest(CASE WHEN trim({text_col}) = '' THEN []
                   ELSE regexp_split_to_array(trim({text_col}), '\\s+')
              END) AS u(tok)
  WHERE {id_col} IS NOT NULL AND {text_col} IS NOT NULL
),
tf AS (SELECT doc, term, count(*) AS tf FROM toks GROUP BY 1, 2),
norms AS (SELECT doc, sum(tf * tf) AS n2 FROM tf GROUP BY doc),
rare AS (SELECT term FROM tf GROUP BY term HAVING count(*) <= {max_df}),
post AS (SELECT tf.* FROM tf JOIN rare USING (term)),
dots AS (
  SELECT a.doc AS id_a, b.doc AS id_b,
         CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
  FROM post a JOIN post b ON a.term = b.term AND a.doc < b.doc
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b, dot,
         round(dot / (sqrt(CAST(na.n2 AS DOUBLE))
                      * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cos
  FROM dots
  JOIN norms na ON na.doc = id_a
  JOIN norms nb ON nb.doc = id_b
)
SELECT id_a, id_b, dot, cos FROM scored
WHERE cos >= {float(min_cos)!r}
ORDER BY cos DESC, id_a, id_b
LIMIT {top_k}
"""
