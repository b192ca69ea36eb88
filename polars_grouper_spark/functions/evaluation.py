"""Model-evaluation metrics, distributed: ROC-AUC, average precision,
NDCG@k, calibration bins, Gini concentration, Cohen's kappa, and
distribution entropy.

A 100 TB training-data pipeline is steered by classifiers and rankers
(quality filters, language ID, retrieval scorers); evaluating them IS
a data-scale problem — the predictions live next to the corpus, so the
metrics must run where the data is instead of sampling down to a
driver-side sklearn call.

Determinism contract (what makes the DuckDB oracle exact):

* ROC-AUC uses the Mann-Whitney identity on DISTINCT-score counts —
  concordant/tied pair counts are exact integers, so the metric is one
  integer-over-integer double division, bit-stable under any
  aggregation order.
* Ranked metrics (AP, NDCG) rank by a TOTAL order (score desc, id asc)
  so ties never depend on partitioning; per-rank float terms are
  micro-quantized to integers (``round(term * 1e8) AS BIGINT``) and
  summed EXACTLY, with one final double division and NO engine-side
  rounding of the result.  Rounding a float sum engine-side is a trap
  this module deliberately avoids: a sum of 1e-8 multiples lands on a
  half boundary of the rounding digit ~1% of the time per value, and
  Spark (BigDecimal HALF_UP on the shortest decimal form) and DuckDB
  (numeric rounding) then disagree by 1e-6.  Exact integer sums + one
  shared division produce bit-identical doubles on both engines.
* Kappa and Gini reduce to integer moments (pair counts / rank-weighted
  sums) with a single final division.

Scale: every metric is one groupBy + at most one window sort per group
— the same shuffle shape as a sort-based aggregation; nothing collects
to the driver and no metric materializes pairs (AUC over P x N pairs is
computed from distinct-score cumulative counts, never the pair join).

Reference surface: none (beyond-reference operators, SURVEY.md §2
extension list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_grouper_spark.plans.parallelism import local_result


def _grp(by: "list[str] | None") -> "list[str]":
    return list(by) if by else []


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by: "list[str] | None" = None,
) -> DataFrame:
    """Area under the ROC curve per group ->
    ``(*by, n_pos, n_neg, auc)``.

    Mann-Whitney form: reduce to one row per (group, distinct score)
    with positive/negative counts, then a cumulative window gives the
    number of negatives strictly below each score.  ``auc = (2 *
    concordant + tied) / (2 * n_pos * n_neg)`` — every term an exact
    integer, so the value cannot drift with partitioning.  Groups with
    no positives or no negatives return NULL (undefined, not 0.5).

    Scale: the groupBy collapses to distinct scores BEFORE the window,
    so the sort handles |distinct scores| rows per group, not |rows|;
    the pair counts are never materialized as pairs.
    """
    keys = _grp(by)
    lab = F.col(label_col).cast("int")
    per_score = df.groupBy(*keys, F.col(score_col).alias("_s")).agg(
        F.sum(lab).alias("_p"),
        F.sum(1 - lab).alias("_n"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = per_score.withColumn(
        "_neg_below", F.coalesce(F.sum("_n").over(w), F.lit(0))
    )
    agg = scored.groupBy(*keys).agg(
        F.sum("_p").alias("n_pos"),
        F.sum("_n").alias("n_neg"),
        F.sum(F.col("_p") * F.col("_neg_below")).alias("_conc"),
        F.sum(F.col("_p") * F.col("_n")).alias("_tied"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        (2 * F.col("_conc") + F.col("_tied"))
        / (2.0 * F.col("n_pos") * F.col("n_neg")),
    )
    return agg.select(*keys, "n_pos", "n_neg", auc.alias("auc"))


def roc_auc_sql(
    rel_sql: str,
    score_expr: str,
    label_expr: str,
    by: "list[str] | None" = None,
) -> str:
    """DuckDB oracle for :func:`roc_auc` (same distinct-score form)."""
    keys = _grp(by)
    kcsv = ", ".join(keys)
    kpfx = f"{kcsv}, " if keys else ""
    part = f"PARTITION BY {kcsv} " if keys else ""
    grp = f"GROUP BY {kcsv}" if keys else ""
    return f"""
WITH per_score AS (
  SELECT {kpfx}{score_expr} AS s,
         SUM(CAST({label_expr} AS INT)) AS p,
         SUM(1 - CAST({label_expr} AS INT)) AS n
  FROM ({rel_sql}) GROUP BY {kpfx}s
), cum AS (
  SELECT {kpfx}p, n,
         COALESCE(SUM(n) OVER ({part}ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS neg_below
  FROM per_score
)
SELECT {kpfx}CAST(SUM(p) AS BIGINT) AS n_pos, CAST(SUM(n) AS BIGINT) AS n_neg,
       CASE WHEN SUM(p) > 0 AND SUM(n) > 0 THEN
         (2 * SUM(p * neg_below) + SUM(p * n))
         / (2.0 * SUM(p) * SUM(n))
       END AS auc
FROM cum {grp}
"""


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    by: "list[str] | None" = None,
) -> DataFrame:
    """Average precision per group -> ``(*by, n_pos, n, avg_prec)``:
    mean over positives of precision@(rank of that positive), ranked by
    the total order (score desc, id asc).  Each precision term is
    micro-quantized (``round(cp/k * 1e8)`` as a long) and summed
    exactly; groups without positives return NULL.
    """
    keys = _grp(by)
    lab = F.col(label_col).cast("int")
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = df.select(
        *keys,
        lab.alias("_l"),
        F.count(F.lit(1)).over(w).alias("_k"),
        F.sum(lab).over(w).alias("_cp"),
    )
    term = F.when(
        F.col("_l") == 1,
        F.round(F.col("_cp") / F.col("_k") * 1e8).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    agg = ranked.groupBy(*keys).agg(
        F.sum("_l").alias("n_pos"),
        F.count(F.lit(1)).alias("n"),
        F.sum(term).alias("_tsum"),
    )
    ap = F.when(
        F.col("n_pos") > 0,
        F.col("_tsum") / 1e8 / F.col("n_pos"),
    )
    return agg.select(*keys, "n_pos", "n", ap.alias("avg_prec"))


def average_precision_sql(
    rel_sql: str,
    score_expr: str,
    label_expr: str,
    id_expr: str,
    by: "list[str] | None" = None,
) -> str:
    """DuckDB oracle for :func:`average_precision`."""
    keys = _grp(by)
    kcsv = ", ".join(keys)
    kpfx = f"{kcsv}, " if keys else ""
    part = f"PARTITION BY {kcsv} " if keys else ""
    grp = f"GROUP BY {kcsv}" if keys else ""
    frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    order = f"ORDER BY {score_expr} DESC, {id_expr} ASC"
    return f"""
WITH ranked AS (
  SELECT {kpfx}CAST({label_expr} AS INT) AS l,
         COUNT(*) OVER ({part}{order} {frame}) AS k,
         SUM(CAST({label_expr} AS INT)) OVER ({part}{order} {frame}) AS cp
  FROM ({rel_sql})
)
SELECT {kpfx}CAST(SUM(l) AS BIGINT) AS n_pos, COUNT(*) AS n,
       CASE WHEN SUM(l) > 0 THEN
         SUM(CASE WHEN l = 1 THEN
               CAST(ROUND(cp / CAST(k AS DOUBLE) * 1e8) AS BIGINT)
             ELSE 0 END) / 1e8 / SUM(l)
       END AS avg_prec
FROM ranked {grp}
"""


def ndcg_at_k(
    df: DataFrame,
    query_col: str,
    id_col: str,
    score_col: str,
    rel_col: str,
    k: int,
) -> DataFrame:
    """NDCG@k per query -> ``(query, dcg, idcg, ndcg)`` with linear
    gain ``rel / log2(rank + 1)`` (linear, not exponential, so integer
    relevance grades cannot overflow the gain).  Predicted ranking
    orders by (score desc, id asc); the ideal ranking by (rel desc,
    id asc).  Per-rank gains are micro-quantized to longs (1e8 scale)
    and summed exactly — DCG is ``micro_sum / 1e8``, one shared
    division, bit-identical across engines.

    Scale: two window sorts over the same query partition (predicted +
    ideal order) — Catalyst plans one shuffle on the query key and two
    in-partition sorts; no joins, no pair blowup.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    wq = Window.partitionBy(query_col)
    w_pred = wq.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    w_ideal = wq.orderBy(F.col(rel_col).desc(), F.col(id_col).asc())
    ranked = df.select(
        F.col(query_col).alias("query"),
        F.col(rel_col).cast("double").alias("_r"),
        F.row_number().over(w_pred).alias("_kp"),
        F.row_number().over(w_ideal).alias("_ki"),
    )
    zero = F.lit(0).cast("long")
    gain_pred = F.when(
        F.col("_kp") <= k,
        F.round(F.col("_r") / F.log2(F.col("_kp") + 1.0) * 1e8).cast("long"),
    ).otherwise(zero)
    gain_ideal = F.when(
        F.col("_ki") <= k,
        F.round(F.col("_r") / F.log2(F.col("_ki") + 1.0) * 1e8).cast("long"),
    ).otherwise(zero)
    agg = ranked.groupBy("query").agg(
        (F.sum(gain_pred) / 1e8).alias("dcg"),
        (F.sum(gain_ideal) / 1e8).alias("idcg"),
    )
    ndcg = F.when(
        F.col("idcg") > 0, F.col("dcg") / F.col("idcg")
    ).otherwise(F.lit(None).cast("double"))
    return agg.select("query", "dcg", "idcg", ndcg.alias("ndcg"))


def ndcg_at_k_sql(
    rel_sql: str,
    query_expr: str,
    id_expr: str,
    score_expr: str,
    rel_expr: str,
    k: int,
) -> str:
    """DuckDB oracle for :func:`ndcg_at_k` (same total orders)."""
    return f"""
WITH ranked AS (
  SELECT {query_expr} AS query, CAST({rel_expr} AS DOUBLE) AS r,
         ROW_NUMBER() OVER (PARTITION BY {query_expr}
           ORDER BY {score_expr} DESC, {id_expr} ASC) AS kp,
         ROW_NUMBER() OVER (PARTITION BY {query_expr}
           ORDER BY {rel_expr} DESC, {id_expr} ASC) AS ki
  FROM ({rel_sql})
), agg AS (
  SELECT query,
         SUM(CASE WHEN kp <= {k}
           THEN CAST(ROUND(r / LOG2(kp + 1.0) * 1e8) AS BIGINT)
           ELSE 0 END) / 1e8 AS dcg,
         SUM(CASE WHEN ki <= {k}
           THEN CAST(ROUND(r / LOG2(ki + 1.0) * 1e8) AS BIGINT)
           ELSE 0 END) / 1e8 AS idcg
  FROM ranked GROUP BY query
)
SELECT query, dcg, idcg,
       CASE WHEN idcg > 0 THEN dcg / idcg END AS ndcg
FROM agg
"""


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a probability-like score in [0, 1]
    -> ``(bin, n, n_pos, mean_score, pos_rate)``.  Bin membership is an
    integer floor decision (score exactly 1.0 clamps into the last
    bin); means divide a rounded-sum by an exact count.

    The calibration curve is THE diagnostic for a quality-filter
    classifier before its threshold picks what survives into training.
    One groupBy, map-side combinable — a single scan at any scale.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    s = F.col(score_col).cast("double")
    b = F.least(F.floor(s * n_bins).cast("long"), F.lit(n_bins - 1))
    lab = F.col(label_col).cast("int")
    return (
        df.select(b.alias("bin"), s.alias("_s"), lab.alias("_l"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_l").alias("n_pos"),
            F.sum(F.round(F.col("_s") * 1e8).cast("long")).alias("_ssum"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            (F.col("_ssum") / 1e8 / F.col("n")).alias("mean_score"),
            (F.col("n_pos") / F.col("n").cast("double")).alias("pos_rate"),
        )
    )


def calibration_bins_sql(
    rel_sql: str,
    score_expr: str,
    label_expr: str,
    n_bins: int = 10,
) -> str:
    """DuckDB oracle for :func:`calibration_bins`."""
    return f"""
WITH binned AS (
  SELECT LEAST(CAST(FLOOR(CAST({score_expr} AS DOUBLE) * {n_bins})
               AS BIGINT), {n_bins - 1}) AS bin,
         CAST({score_expr} AS DOUBLE) AS s,
         CAST({label_expr} AS INT) AS l
  FROM ({rel_sql})
)
SELECT bin, COUNT(*) AS n, CAST(SUM(l) AS BIGINT) AS n_pos,
       SUM(CAST(ROUND(s * 1e8) AS BIGINT)) / 1e8 / COUNT(*) AS mean_score,
       SUM(l) / CAST(COUNT(*) AS DOUBLE) AS pos_rate
FROM binned GROUP BY bin
"""


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    by: "list[str] | None" = None,
) -> DataFrame:
    """Gini concentration per group -> ``(*by, n, total, gini)`` from
    the rank-weighted identity ``G = (2 * sum(i * x_i) - (n + 1) *
    sum(x)) / (n * sum(x))`` over values sorted ascending.

    ``value_col`` must be integral (pass cents, token counts, byte
    sizes) so every moment is an exact integer; ties need no
    tie-breaker because equal values contribute the same sum under any
    permutation of their ranks.  Groups with non-positive totals return
    NULL.  Gini over document-length / domain-share distributions is
    the standard "is one source dominating the corpus?" check.
    """
    keys = _grp(by)
    w = Window.partitionBy(*keys).orderBy(F.col(value_col).asc())
    ranked = df.select(
        *keys,
        F.col(value_col).cast("long").alias("_x"),
        F.row_number().over(w).alias("_i"),
    )
    agg = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("total"),
        F.sum(F.col("_i") * F.col("_x")).alias("_ix"),
    )
    gini = F.when(
        F.col("total") > 0,
        (2 * F.col("_ix") - (F.col("n") + 1) * F.col("total"))
        / (F.col("n") * F.col("total")).cast("double"),
    )
    return agg.select(*keys, "n", "total", gini.alias("gini"))


def gini_coefficient_sql(
    rel_sql: str,
    value_expr: str,
    by: "list[str] | None" = None,
) -> str:
    """DuckDB oracle for :func:`gini_coefficient`."""
    keys = _grp(by)
    kcsv = ", ".join(keys)
    kpfx = f"{kcsv}, " if keys else ""
    part = f"PARTITION BY {kcsv} " if keys else ""
    grp = f"GROUP BY {kcsv}" if keys else ""
    return f"""
WITH ranked AS (
  SELECT {kpfx}CAST({value_expr} AS BIGINT) AS x,
         ROW_NUMBER() OVER ({part}ORDER BY CAST({value_expr} AS BIGINT)
           ASC) AS i
  FROM ({rel_sql})
)
SELECT {kpfx}COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS total,
       CASE WHEN SUM(x) > 0 THEN
         (2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x))
         / CAST(COUNT(*) * SUM(x) AS DOUBLE)
       END AS gini
FROM ranked {grp}
"""


def cohens_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
) -> DataFrame:
    """Cohen's kappa between two categorical labelings -> one row
    ``(n, n_agree, kappa)``.

    Chance-corrected agreement via the all-integer identity
    ``kappa = (n * agree - sum_c rowmarg_c * colmarg_c) /
    (n^2 - sum_c rowmarg_c * colmarg_c)`` — the marginal product is a
    broadcast-sized join on category (|categories| rows), so the metric
    is three aggregations and one tiny join at any corpus size.  The
    canonical use here: declared document language vs the pipeline's
    language-ID prediction.  NULL labels on either side are dropped
    (agreement over co-labeled rows).
    """
    pairs = df.select(
        F.col(rater_a_col).cast("string").alias("_a"),
        F.col(rater_b_col).cast("string").alias("_b"),
    ).where(F.col("_a").isNotNull() & F.col("_b").isNotNull())
    base = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("_a") == F.col("_b")).cast("long")).alias("n_agree"),
    )
    ma = pairs.groupBy(F.col("_a").alias("_c")).agg(
        F.count(F.lit(1)).alias("_ra")
    )
    mb = pairs.groupBy(F.col("_b").alias("_c")).agg(
        F.count(F.lit(1)).alias("_cb")
    )
    pe = (
        ma.join(mb, "_c")
        .agg(F.sum(F.col("_ra") * F.col("_cb")).alias("_pe"))
        .select(F.coalesce("_pe", F.lit(0)).alias("_pe"))
    )
    joined = base.crossJoin(F.broadcast(pe))
    kappa = F.when(
        F.col("n") * F.col("n") != F.col("_pe"),
        (F.col("n") * F.col("n_agree") - F.col("_pe"))
        / (F.col("n") * F.col("n") - F.col("_pe")).cast("double"),
    )
    return joined.select("n", "n_agree", kappa.alias("kappa"))


def cohens_kappa_sql(rel_sql: str, a_expr: str, b_expr: str) -> str:
    """DuckDB oracle for :func:`cohens_kappa`."""
    return f"""
WITH pairs AS (
  SELECT CAST({a_expr} AS VARCHAR) AS a, CAST({b_expr} AS VARCHAR) AS b
  FROM ({rel_sql})
  WHERE {a_expr} IS NOT NULL AND {b_expr} IS NOT NULL
), base AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS n_agree
  FROM pairs
), pe AS (
  SELECT COALESCE(SUM(ra * cb), 0) AS pe FROM
    (SELECT a AS c, COUNT(*) AS ra FROM pairs GROUP BY a) ma
    JOIN (SELECT b AS c, COUNT(*) AS cb FROM pairs GROUP BY b) mb
    USING (c)
)
SELECT n, CAST(n_agree AS BIGINT) AS n_agree,
       CASE WHEN n * n <> pe THEN
         (n * n_agree - pe) / CAST(n * n - pe AS DOUBLE)
       END AS kappa
FROM base, pe
"""


def dist_entropy(
    df: DataFrame,
    value_col: str,
    by: "list[str] | None" = None,
) -> DataFrame:
    """Shannon entropy (nats) of a categorical distribution per group
    -> ``(*by, n, n_distinct, entropy)``.

    Two-level aggregation: groupBy (group, value) to counts, then a
    per-group EXACT integer sum of micro-quantized ``-(c/n) * ln(c/n)``
    terms (1e8 scale), emitted as ``micro_sum / 1e8``.  Entropy of a
    user's event-type mix or a corpus
    slice's domain mix is a one-number diversity feature — low entropy
    flags bots / single-source floods.
    """
    keys = _grp(by)
    counts = df.groupBy(*keys, F.col(value_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    n = F.sum("_c").over(Window.partitionBy(*keys))
    p = F.col("_c") / n.cast("double")
    termed = counts.select(
        *keys,
        F.col("_c"),
        F.round(-p * F.log(p) * 1e8).cast("long").alias("_t"),
    )
    return termed.groupBy(*keys).agg(
        F.sum("_c").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
        (F.sum("_t") / 1e8).alias("entropy"),
    )


def dist_entropy_sql(
    rel_sql: str,
    value_expr: str,
    by: "list[str] | None" = None,
) -> str:
    """DuckDB oracle for :func:`dist_entropy`."""
    keys = _grp(by)
    kcsv = ", ".join(keys)
    kpfx = f"{kcsv}, " if keys else ""
    part = f"PARTITION BY {kcsv}" if keys else ""
    grp = f"GROUP BY {kcsv}" if keys else ""
    return f"""
WITH counts AS (
  SELECT {kpfx}{value_expr} AS v, COUNT(*) AS c
  FROM ({rel_sql}) GROUP BY {kpfx}v
), termed AS (
  SELECT {kpfx}c,
         CAST(ROUND(-(c / CAST(SUM(c) OVER ({part}) AS DOUBLE))
              * LN(c / CAST(SUM(c) OVER ({part}) AS DOUBLE)) * 1e8)
              AS BIGINT) AS t
  FROM counts
)
SELECT {kpfx}CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_distinct,
       SUM(t) / 1e8 AS entropy
FROM termed {grp}
"""


def chi_square(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Chi-square test of independence between two categorical columns
    -> one row ``(n, dof, chi2)``.

    The feature-audit staple: is the quality label independent of the
    source domain?  Observed counts come from one groupBy; expected
    counts ``row_marg * col_marg / n`` from two marginal aggregations
    joined back (all broadcast-sized).  Each cell's
    ``(obs - exp)^2 / exp`` term micro-quantizes to a long (1e6 scale —
    chi2 grows with n, so the scale trades 2 decimals for headroom) and
    sums exactly; ``dof = (|A| - 1) * (|B| - 1)``.  Cells with an
    absent (a, b) combination contribute ``exp`` (obs = 0), accounted
    by summing over the marginal CROSS of categories, not just
    observed pairs.
    """
    pairs = df.select(
        F.col(a_col).cast("string").alias("_a"),
        F.col(b_col).cast("string").alias("_b"),
    ).where(F.col("_a").isNotNull() & F.col("_b").isNotNull())
    obs = pairs.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("_o"))
    ma = pairs.groupBy("_a").agg(F.count(F.lit(1)).alias("_ra"))
    mb = pairs.groupBy("_b").agg(F.count(F.lit(1)).alias("_cb"))
    n = pairs.count()
    if n == 0:
        raise ValueError("chi_square needs at least one co-labeled row")
    grid = ma.crossJoin(F.broadcast(mb)).join(
        F.broadcast(obs), ["_a", "_b"], "left"
    )
    exp = F.col("_ra") * F.col("_cb") / F.lit(float(n))
    o = F.coalesce(F.col("_o"), F.lit(0)).cast("double")
    term = F.round((o - exp) * (o - exp) / exp * 1e6).cast("long")
    return grid.agg(
        F.lit(n).cast("long").alias("n"),
        (
            (F.count_distinct(F.col("_a")) - 1)
            * (F.count_distinct(F.col("_b")) - 1)
        ).alias("dof"),
        (F.sum(term) / 1e6).alias("chi2"),
    )


def chi_square_sql(rel_sql: str, a_expr: str, b_expr: str) -> str:
    """DuckDB oracle for :func:`chi_square` (same grid and micro-sum)."""
    return f"""
WITH pairs AS (
  SELECT CAST({a_expr} AS VARCHAR) AS a, CAST({b_expr} AS VARCHAR) AS b
  FROM ({rel_sql})
  WHERE {a_expr} IS NOT NULL AND {b_expr} IS NOT NULL
), obs AS (
  SELECT a, b, COUNT(*) AS o FROM pairs GROUP BY a, b
), ma AS (SELECT a, COUNT(*) AS ra FROM pairs GROUP BY a),
mb AS (SELECT b, COUNT(*) AS cb FROM pairs GROUP BY b),
tot AS (SELECT COUNT(*) AS n FROM pairs),
grid AS (
  SELECT ma.a, mb.b, ma.ra, mb.cb, COALESCE(obs.o, 0) AS o, tot.n
  FROM ma CROSS JOIN mb CROSS JOIN tot
  LEFT JOIN obs ON obs.a = ma.a AND obs.b = mb.b
)
SELECT MAX(n) AS n,
       (COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1) AS dof,
       SUM(CAST(ROUND(
         (CAST(o AS DOUBLE) - ra * cb / CAST(n AS DOUBLE))
         * (CAST(o AS DOUBLE) - ra * cb / CAST(n AS DOUBLE))
         / (ra * cb / CAST(n AS DOUBLE)) * 1e6) AS BIGINT)) / 1e6 AS chi2
FROM grid
"""


def mutual_information(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Mutual information (nats) between two categorical columns -> one
    row ``(n, mi)``: ``MI = sum_xy p_xy * ln(p_xy / (p_x * p_y))`` over
    OBSERVED pairs (absent pairs contribute 0 by the x*ln(x) limit).

    The feature-selection companion to :func:`chi_square` — scale-free
    dependence in nats.  Same plan shape: one pair groupBy + two
    broadcast marginals; terms micro-quantize to longs (1e8) and sum
    exactly.
    """
    pairs = df.select(
        F.col(a_col).cast("string").alias("_a"),
        F.col(b_col).cast("string").alias("_b"),
    ).where(F.col("_a").isNotNull() & F.col("_b").isNotNull())
    obs = pairs.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("_o"))
    ma = pairs.groupBy("_a").agg(F.count(F.lit(1)).alias("_ra"))
    mb = pairs.groupBy("_b").agg(F.count(F.lit(1)).alias("_cb"))
    n = pairs.count()
    if n == 0:
        raise ValueError("mutual_information needs at least one row")
    nd = F.lit(float(n))
    joined = obs.join(F.broadcast(ma), "_a").join(F.broadcast(mb), "_b")
    p_xy = F.col("_o") / nd
    ratio = F.col("_o") * nd / (F.col("_ra") * F.col("_cb"))
    term = F.round(p_xy * F.log(ratio) * 1e8).cast("long")
    return joined.agg(
        F.lit(n).cast("long").alias("n"),
        (F.sum(term) / 1e8).alias("mi"),
    )


def mutual_information_sql(rel_sql: str, a_expr: str, b_expr: str) -> str:
    """DuckDB oracle for :func:`mutual_information`."""
    return f"""
WITH pairs AS (
  SELECT CAST({a_expr} AS VARCHAR) AS a, CAST({b_expr} AS VARCHAR) AS b
  FROM ({rel_sql})
  WHERE {a_expr} IS NOT NULL AND {b_expr} IS NOT NULL
), obs AS (
  SELECT a, b, COUNT(*) AS o FROM pairs GROUP BY a, b
), ma AS (SELECT a, COUNT(*) AS ra FROM pairs GROUP BY a),
mb AS (SELECT b, COUNT(*) AS cb FROM pairs GROUP BY b),
tot AS (SELECT COUNT(*) AS n FROM pairs)
SELECT MAX(tot.n) AS n,
       SUM(CAST(ROUND(
         (o / CAST(tot.n AS DOUBLE))
         * LN(o * CAST(tot.n AS DOUBLE) / (CAST(ra AS DOUBLE) * cb))
         * 1e8) AS BIGINT)) / 1e8 AS mi
FROM obs JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot
"""


def rank_biased_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    id_col: str,
    score_col: str,
    *,
    p: float = 0.9,
    depth: int = 50,
) -> DataFrame:
    """Truncated rank-biased overlap (Webber et al. 2010) between two
    rankings -> one row ``(depth, n_common, rbo)`` with
    ``rbo = (1-p) * sum_{d<=depth} p^(d-1) * |A_d ∩ B_d| / d``.

    THE metric for "did the new ranker/quality-scorer reorder what
    users actually see?": top-weighted (a swap at rank 2 matters more
    than at rank 40), defined for non-conjoint lists, truncation-aware.

    Plan: each side ranks once by (score desc, id asc) and keeps its
    top ``depth`` (TakeOrdered-sized); an item's first co-appearance
    depth is ``max(rank_a, rank_b)`` from one inner join; overlap@d
    for all d comes from a depth×common theta-join (``depth²`` rows at
    most — metadata).  The geometric weights ``p^(d-1)`` are
    PYTHON-computed literals shared verbatim with the oracle —
    ``pow()`` is not correctly-rounded-guaranteed across libms, so no
    engine ever evaluates it.  Terms micro-quantize to longs and sum
    exactly.
    """
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1), got {p}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")

    def top(df: DataFrame, tag: str) -> DataFrame:
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        return (
            df.select(
                F.col(id_col).alias("id"),
                F.row_number().over(w).alias(f"r_{tag}"),
            )
            .where(F.col(f"r_{tag}") <= depth)
        )

    common = top(df_a, "a").join(top(df_b, "b"), "id").select(
        F.greatest("r_a", "r_b").alias("m")
    )
    spark = df_a.sparkSession
    weights = [(d, p ** (d - 1)) for d in range(1, depth + 1)]
    depths = local_result(spark, weights, "d int, w double")
    terms = (
        depths.join(common, F.col("m") <= F.col("d"), "left")
        .groupBy("d", "w")
        .agg(F.sum(F.col("m").isNotNull().cast("long")).alias("ov"))
        .select(
            F.round(F.col("w") * F.col("ov") / F.col("d") * 1e8)
            .cast("long")
            .alias("_t"),
        )
    )
    n_common = common.count()
    return terms.agg(
        F.lit(depth).alias("depth"),
        F.lit(n_common).cast("long").alias("n_common"),
        (F.sum("_t") / 1e8 * F.lit(1.0 - p)).alias("rbo"),
    )


def rank_biased_overlap_sql(
    a_sql: str,
    b_sql: str,
    id_expr: str,
    score_expr: str,
    *,
    p: float = 0.9,
    depth: int = 50,
) -> str:
    """DuckDB oracle for :func:`rank_biased_overlap` (same literal
    weights, same micro-sum)."""
    values = ", ".join(
        f"({d}, CAST({p ** (d - 1)!r} AS DOUBLE))"
        for d in range(1, depth + 1)
    )

    def top(src: str, tag: str) -> str:
        return (
            f"SELECT id, r_{tag} FROM (SELECT {id_expr} AS id, "
            f"ROW_NUMBER() OVER (ORDER BY {score_expr} DESC, {id_expr} ASC)"
            f" AS r_{tag} FROM ({src})) WHERE r_{tag} <= {depth}"
        )

    return f"""
WITH ta AS ({top(a_sql, 'a')}), tb AS ({top(b_sql, 'b')}),
common AS (
  SELECT GREATEST(r_a, r_b) AS m FROM ta JOIN tb USING (id)
),
depths(d, w) AS (VALUES {values}),
terms AS (
  SELECT CAST(ROUND(depths.w * COUNT(common.m) / depths.d * 1e8)
              AS BIGINT) AS t
  FROM depths LEFT JOIN common ON common.m <= depths.d
  GROUP BY depths.d, depths.w
)
SELECT {depth} AS depth,
       (SELECT COUNT(*) FROM common) AS n_common,
       SUM(t) / 1e8 * CAST({1.0 - p!r} AS DOUBLE) AS rbo
FROM terms
"""


def precision_threshold(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    target_num: int,
    target_den: int,
) -> DataFrame:
    """The operating point of a quality filter -> one row
    ``(threshold, n_kept, n_pos_kept, precision, recall)``: the largest
    keep-set prefix of the (score desc, id asc) order whose precision
    is still >= ``target_num / target_den``.

    This is how a scored corpus becomes a filtered corpus: sweep the
    cut down the ranking, keep everything above the last rank where
    precision holds.  The precision test is the integer cross-multiply
    ``cum_pos * target_den >= target_num * k`` — no float precision
    column, no tolerance; the target is a RATIONAL (pass 9, 10 for
    90%), so the sweep decision can never waver on representation.
    Returns the degenerate all-drop row (n_kept=0, NULL threshold) when
    no prefix qualifies.

    One window over the ranking + one argmax; the sort is the same
    cost as the ranking any threshold sweep needs.
    """
    if not (0 < target_num <= target_den):
        raise ValueError(
            f"target must satisfy 0 < num <= den, got {target_num}/{target_den}"
        )
    lab = F.col(label_col).cast("int")
    w = Window.orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = df.select(
        F.col(score_col).alias("_s"),
        lab.alias("_l"),
        F.count(F.lit(1)).over(w).alias("_k"),
        F.sum(lab).over(w).alias("_cp"),
    )
    tot = ranked.agg(
        F.max("_k").alias("_n"), F.max("_cp").alias("_np")
    )
    ok = ranked.where(
        F.col("_cp") * target_den >= target_num * F.col("_k")
    )
    best = ok.agg(
        F.max(
            F.struct(
                F.col("_k").alias("k"),
                F.col("_cp").alias("cp"),
                F.col("_s").alias("s"),
            )
        ).alias("b")
    )
    return best.crossJoin(F.broadcast(tot)).select(
        F.col("b.s").alias("threshold"),
        F.coalesce(F.col("b.k"), F.lit(0)).alias("n_kept"),
        F.coalesce(F.col("b.cp"), F.lit(0)).alias("n_pos_kept"),
        F.when(
            F.col("b.k").isNotNull(),
            F.col("b.cp") / F.col("b.k").cast("double"),
        ).alias("precision"),
        F.when(
            (F.col("b.k").isNotNull()) & (F.col("_np") > 0),
            F.col("b.cp") / F.col("_np").cast("double"),
        ).alias("recall"),
    )


def precision_threshold_sql(
    rel_sql: str,
    score_expr: str,
    label_expr: str,
    id_expr: str,
    target_num: int,
    target_den: int,
) -> str:
    """DuckDB oracle for :func:`precision_threshold`."""
    frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    order = f"ORDER BY {score_expr} DESC, {id_expr} ASC"
    return f"""
WITH ranked AS (
  SELECT {score_expr} AS s, CAST({label_expr} AS INT) AS l,
         COUNT(*) OVER ({order} {frame}) AS k,
         SUM(CAST({label_expr} AS INT)) OVER ({order} {frame}) AS cp
  FROM ({rel_sql})
), tot AS (SELECT MAX(k) AS n, MAX(cp) AS np FROM ranked),
best AS (
  SELECT k, cp, s FROM ranked
  WHERE cp * {target_den} >= {target_num} * k
  ORDER BY k DESC LIMIT 1
)
SELECT best.s AS threshold,
       CAST(COALESCE(best.k, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(best.cp, 0) AS BIGINT) AS n_pos_kept,
       CASE WHEN best.k IS NOT NULL
            THEN best.cp / CAST(best.k AS DOUBLE) END AS precision,
       CASE WHEN best.k IS NOT NULL AND tot.np > 0
            THEN best.cp / CAST(tot.np AS DOUBLE) END AS recall
FROM tot LEFT JOIN best ON TRUE
"""


def lift_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Cumulative-gains / lift table -> one row per score bucket
    ``(bucket, n, n_pos, cum_n, cum_pos, capture_rate, lift)``:
    rank by (score desc, id asc), cut into ``n_buckets`` equal-count
    buckets, report how much of the positive mass each prefix captures
    and the bucket's lift over the base rate.

    The campaign/filter-targeting readout ("the top decile holds 4x
    its share of positives").  Bucket boundaries use the same integer
    division as :func:`~..functions.features.quantile_map`; counts are
    exact, the two ratios are single divisions.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    lab = F.col(label_col).cast("int")
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    ranked = df.select(
        lab.alias("_l"), F.row_number().over(w).alias("_r")
    )
    n = ranked.count()
    if n == 0:
        raise ValueError("lift_table: empty input")
    bucket = F.expr(f"(_r * {n_buckets}L - 1) div {n}L + 1")
    per = ranked.select(bucket.alias("bucket"), "_l").groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_l").alias("n_pos"),
    )
    wc = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    return per.select(
        "bucket",
        "n",
        "n_pos",
        F.sum("n").over(wc).alias("cum_n"),
        F.sum("n_pos").over(wc).alias("cum_pos"),
        (
            F.sum("n_pos").over(wc)
            / F.greatest(F.sum("n_pos").over(wt), F.lit(1)).cast("double")
        ).alias("capture_rate"),
        (
            F.col("n_pos")
            * F.sum("n").over(wt)
            / (
                F.col("n")
                * F.greatest(F.sum("n_pos").over(wt), F.lit(1))
            ).cast("double")
        ).alias("lift"),
    )


def lift_table_sql(
    rel_sql: str,
    score_expr: str,
    label_expr: str,
    id_expr: str,
    n_buckets: int = 10,
) -> str:
    """DuckDB oracle for :func:`lift_table`."""
    return f"""
WITH ranked AS (
  SELECT CAST({label_expr} AS INT) AS l,
         ROW_NUMBER() OVER (ORDER BY {score_expr} DESC, {id_expr} ASC) AS r
  FROM ({rel_sql})
), nn AS (SELECT COUNT(*) AS n_all FROM ranked),
per AS (
  SELECT (r * {n_buckets} - 1) // nn.n_all + 1 AS bucket,
         COUNT(*) AS n, SUM(l) AS n_pos
  FROM ranked CROSS JOIN nn GROUP BY 1
)
SELECT bucket, n, CAST(n_pos AS BIGINT) AS n_pos,
       CAST(SUM(n) OVER (ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
       CAST(SUM(n_pos) OVER (ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
       SUM(n_pos) OVER (ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         / CAST(GREATEST(SUM(n_pos) OVER (), 1) AS DOUBLE) AS capture_rate,
       n_pos * SUM(n) OVER ()
         / CAST(n * GREATEST(SUM(n_pos) OVER (), 1) AS DOUBLE) AS lift
FROM per
"""


def adjusted_rand(
    df: DataFrame, label_a: str, label_b: str
) -> DataFrame:
    """Clustering agreement -> ONE row ``(n, rand_index, ari)``: do two
    partitions of the same rows (model clusters vs ground truth, two
    independent labelers, language vs source) carve the data the same
    way?  Rand index = pair-level agreement rate; ARI corrects it for
    chance (0 ~ random, 1 = identical partitions).

    Pure pair counting via the contingency table: every term is a sum
    of integer C(x,2) values over the (tiny) contingency/marginal
    tables — one (a,b) aggregation plus two marginal reductions, no
    row pairs ever materialize.  The two final divisions run on exact
    integers cast to double, so the oracle matches bit for bit."""
    a = F.col(label_a).cast("string")
    b = F.col(label_b).cast("string")
    src = df.where(a.isNotNull() & b.isNotNull()).select(
        a.alias("a"), b.alias("b")
    )
    ct = src.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ij"))
    # T(x) = x(x-1) = 2*C(x,2): keeping the doubled form avoids any
    # division before the final double arithmetic; products run in
    # decimal so cell counts beyond 2^31 can't overflow.
    t2 = lambda c: (  # noqa: E731
        c.cast("decimal(19,0)") * (c.cast("decimal(19,0)") - F.lit(1))
    ).cast("decimal(38,0)")
    cell = ct.agg(F.sum(t2(F.col("n_ij"))).alias("t_ij"))
    rows = (
        ct.groupBy("a").agg(F.sum("n_ij").alias("n_i"))
        .agg(F.sum(t2(F.col("n_i"))).alias("t_a"))
    )
    cols = (
        ct.groupBy("b").agg(F.sum("n_ij").alias("n_j"))
        .agg(F.sum(t2(F.col("n_j"))).alias("t_b"))
    )
    tot = src.agg(F.count(F.lit(1)).alias("n_i"))
    j = (
        cell.crossJoin(F.broadcast(rows))
        .crossJoin(F.broadcast(cols))
        .crossJoin(F.broadcast(tot))
    )
    n = F.col("n_i").cast("double")
    tn = n * (n - F.lit(1.0))
    tij = F.col("t_ij").cast("double")
    ta = F.col("t_a").cast("double")
    tb = F.col("t_b").cast("double")
    rand = (tn + F.lit(2.0) * tij - ta - tb) / tn
    expected = ta * tb / tn
    ari = (tij - expected) / ((ta + tb) / F.lit(2.0) - expected)
    ok = F.col("n_i") >= 2
    return j.select(
        F.col("n_i").alias("n"),
        F.when(ok, rand).alias("rand_index"),
        F.when(ok, ari).alias("ari"),
    )


def adjusted_rand_sql(src_sql: str) -> str:
    """DuckDB oracle for :func:`adjusted_rand` — ``src_sql`` yields
    (a, b)."""
    return f"""
WITH src AS (
  SELECT CAST(a AS VARCHAR) AS a, CAST(b AS VARCHAR) AS b FROM ({src_sql})
  WHERE a IS NOT NULL AND b IS NOT NULL
),
ct AS (SELECT a, b, count(*) AS n_ij FROM src GROUP BY 1, 2),
cell AS (SELECT sum(CAST(CAST(n_ij AS DECIMAL(19,0))
                 * (CAST(n_ij AS DECIMAL(19,0)) - 1) AS DECIMAL(38,0)))
           AS t_ij FROM ct),
ra AS (SELECT sum(CAST(CAST(n_i AS DECIMAL(19,0))
               * (CAST(n_i AS DECIMAL(19,0)) - 1) AS DECIMAL(38,0))) AS t_a
       FROM (SELECT sum(n_ij) AS n_i FROM ct GROUP BY a)),
cb AS (SELECT sum(CAST(CAST(n_j AS DECIMAL(19,0))
               * (CAST(n_j AS DECIMAL(19,0)) - 1) AS DECIMAL(38,0))) AS t_b
       FROM (SELECT sum(n_ij) AS n_j FROM ct GROUP BY b)),
tot AS (SELECT count(*) AS n_i FROM src)
SELECT n_i AS n,
       CASE WHEN n_i >= 2 THEN
         (CAST(n_i AS DOUBLE) * (CAST(n_i AS DOUBLE) - 1.0)
          + 2.0 * CAST(t_ij AS DOUBLE)
          - CAST(t_a AS DOUBLE) - CAST(t_b AS DOUBLE))
         / (CAST(n_i AS DOUBLE) * (CAST(n_i AS DOUBLE) - 1.0))
       END AS rand_index,
       CASE WHEN n_i >= 2 THEN
         (CAST(t_ij AS DOUBLE)
          - CAST(t_a AS DOUBLE) * CAST(t_b AS DOUBLE)
            / (CAST(n_i AS DOUBLE) * (CAST(n_i AS DOUBLE) - 1.0)))
         / ((CAST(t_a AS DOUBLE) + CAST(t_b AS DOUBLE)) / 2.0
            - CAST(t_a AS DOUBLE) * CAST(t_b AS DOUBLE)
              / (CAST(n_i AS DOUBLE) * (CAST(n_i AS DOUBLE) - 1.0)))
       END AS ari
FROM cell CROSS JOIN ra CROSS JOIN cb CROSS JOIN tot
"""
