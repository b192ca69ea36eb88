"""Multinomial Naive Bayes training — counts only, fully distributed.

The classic text-classification trainer (language ID, spam/quality
gates, topic routing) reduces ENTIRELY to token counts, which is why it
belongs in a 100 TB engine: training is two map-side-combinable
aggregations (per-(label, token) counts, per-label totals) plus a
metadata-sized vocabulary scalar — no iteration, no gradient state, no
driver-side model object until the final (labels x vocab)-sized table.

Probabilities are emitted as EXACT integer ratios evaluated in double —
``(count + alpha) / (class_total + alpha * V)`` — not log-probs, so the
cross-engine compare never meets libm's log (both engines divide the
same exact integers).  Callers wanting log-space scoring take ln() of
the column downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def nb_token_probs(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    *,
    alpha: int = 1,
    min_count: int = 2,
) -> DataFrame:
    """Train multinomial NB -> ``(label, token, n, cond_p)`` for every
    OBSERVED (label, token) pair over the min-count-filtered vocabulary
    (unobserved pairs are implicitly ``alpha / (total + alpha*V)`` —
    emitting labels x V zero rows would defeat the point at scale).

    cond_p = (n + alpha) / (label_total + alpha * V), Laplace-smoothed,
    where label_total sums over the KEPT vocabulary and V counts it —
    so the per-label distribution over kept tokens + one shared
    unseen-token mass is properly normalized."""
    if alpha < 1:
        raise ValueError(f"alpha must be >= 1, got {alpha}")
    toks = df.where(
        F.col(label_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(label_col).cast("string").alias("label"),
        F.explode(F.transform(tokens(F.col(text_col)), F.lower)).alias(
            "token"
        ),
    )
    lt = toks.groupBy("label", "token").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        lt.groupBy("token")
        .agg(F.sum("n").alias("_tot"))
        .where(F.col("_tot") >= min_count)
        .select("token")
    )
    kept = lt.join(vocab, "token")
    totals = kept.groupBy("label").agg(F.sum("n").alias("_nl"))
    v = kept.agg(F.countDistinct("token").alias("_v"))
    out = kept.join(F.broadcast(totals), "label").crossJoin(F.broadcast(v))
    a = F.lit(int(alpha))
    return out.select(
        "label",
        "token",
        "n",
        (
            (F.col("n") + a).cast("double")
            / (F.col("_nl") + a * F.col("_v")).cast("double")
        ).alias("cond_p"),
    )


def nb_token_probs_sql(
    table: str,
    label_expr: str,
    text_col: str = "text",
    *,
    alpha: int = 1,
    min_count: int = 2,
) -> str:
    """DuckDB oracle for :func:`nb_token_probs` (whitespace tokens,
    lowercase — the repo-wide tokenizer contract)."""
    return f"""
WITH toks AS (
  SELECT {label_expr} AS label, lower(u.tok) AS token
  FROM {table},
       unnest(CASE WHEN trim({text_col}) = '' THEN []
                   ELSE regexp_split_to_array(trim({text_col}), '\\s+')
              END) AS u(tok)
  WHERE {label_expr} IS NOT NULL AND {text_col} IS NOT NULL
),
lt AS (SELECT label, token, count(*) AS n FROM toks GROUP BY 1, 2),
vocab AS (SELECT token FROM lt GROUP BY token HAVING sum(n) >= {min_count}),
kept AS (SELECT lt.* FROM lt JOIN vocab USING (token)),
totals AS (SELECT label, sum(n) AS nl FROM kept GROUP BY label),
v AS (SELECT count(DISTINCT token) AS v FROM kept)
SELECT label, token, n,
       CAST(n + {alpha} AS DOUBLE) / CAST(nl + {alpha} * v AS DOUBLE) AS cond_p
FROM kept JOIN totals USING (label) CROSS JOIN v
"""
