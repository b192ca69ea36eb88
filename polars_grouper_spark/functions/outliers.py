"""Robust per-group outlier detection (median / MAD modified z-score).

Data-quality triage for training pipelines: "which rows are wildly off
for their group" — price anomalies per priority class, doc lengths per
source, latency per endpoint.  Mean/stddev z-scores break down under the
very outliers being hunted (masking); the standard robust alternative is
the Iglewicz–Hoadley modified z-score ``0.6745 * (x - med) / MAD`` with
``MAD = median(|x - med|)``, flagging ``|z| > 3.5`` (Iglewicz & Hoaglin
1993).

Cross-engine determinism: WHICH rows are flagged is decided entirely in
integer arithmetic.  Values are quantized to integers by the caller
(cents); medians of integers land on halves, and MADs of those deviations
on quarters, so ``med*2`` and ``mad2*2`` are exact integers in both
engines, and the flag condition

    z = 0.6745*dx2/mad2 > T    <=>    6745*dx2*2 > 10*T_milli*mad4

is an exact 64-bit integer comparison — no float rounding ever decides
membership (the repo's float-selection rule).  The printed ``z`` is a
single rounded division, display-only.

Scale: one exact ``median`` per group is a full sort of that group's
values — fine for the moderate group counts this targets (priorities,
sources, endpoints); at extreme cardinality x volume swap the two
median passes for ``sketches.grouped_quantiles`` (mergeable histogram),
trading exactness for a one-scan sketch.  The per-group medians/MADs are
a group-count-sized table broadcast back onto the scan, so the data
itself is read twice and shuffled once per median.

Reference surface: none (beyond-reference operator, SURVEY.md §2
extension list).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    id_col: str,
    *,
    threshold_milli: int = 3500,
) -> DataFrame:
    """Rows whose modified z-score exceeds ``threshold_milli / 1000`` ->
    ``(id, grp, value_q, med, mad, z)``, one row per flagged input row.

    ``value_col`` must already be integer-quantized (e.g. cents) — the
    integer-exact flag guarantee depends on it.  Groups with ``MAD == 0``
    (more than half the group at the median) are excluded: the modified
    z-score is undefined there and flagging "any deviation at all" is
    never what an outlier scan means.  Null groups/values/ids drop.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    src = df.where(
        F.col(group_col).isNotNull() & v.isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.col(group_col).cast("string").alias("grp"),
        v.cast("long").alias("vq"),
    )
    from polars_grouper_spark.plans.iteration import truncate_lineage

    # src feeds the median agg AND the deviation join; dx (below) feeds
    # the MAD agg AND the flag join — materialize each once.
    src = truncate_lineage(src)
    med = src.groupBy("grp").agg(F.median("vq").alias("med"))
    # med is k or k+0.5 -> med*2 is an exact integer; dx2 = |2x - 2med|
    dx = src.join(F.broadcast(med), "grp").select(
        "id",
        "grp",
        "vq",
        "med",
        F.abs(F.col("vq") * 2 - (F.col("med") * 2).cast("long")).alias("dx2"),
    )
    dx = truncate_lineage(dx)
    mad = dx.groupBy("grp").agg(F.median("dx2").alias("mad2"))
    # mad2 is j or j+0.5 -> mad2*2 = mad4 exact; real MAD = mad2/2
    flagged = (
        dx.join(F.broadcast(mad), "grp")
        .withColumn("mad4", (F.col("mad2") * 2).cast("long"))
        # z = 0.6745*dx2/mad2 > T_milli/1000
        #   <=> 6745*dx2 > 10*T_milli*mad2  <=>  6745*dx2*2 > 10*T_milli*mad4
        .where(
            (F.col("mad4") > 0)
            & (
                F.lit(6745) * F.col("dx2") * 2
                > F.lit(10 * threshold_milli) * F.col("mad4")
            )
        )
    )
    return flagged.select(
        "id",
        "grp",
        F.col("vq").alias("value_q"),
        F.round("med", 1).alias("med"),
        F.round(F.col("mad2") / 2.0, 2).alias("mad"),
        F.round(
            F.lit(6745.0) * F.col("dx2") / (1.0e4 * F.col("mad2")), 6
        ).alias("z"),
    )


def robust_outliers_sql(
    src_sql: str, *, threshold_milli: int = 3500
) -> str:
    """DuckDB oracle replaying :func:`robust_outliers` — ``src_sql``
    yields (id, grp, vq) already quantized."""
    return f"""
WITH src AS ({src_sql}),
med AS (SELECT grp, median(vq) AS med FROM src GROUP BY grp),
dx AS (
  SELECT s.id, s.grp, s.vq, m.med,
         abs(s.vq * 2 - CAST(m.med * 2 AS BIGINT)) AS dx2
  FROM src s JOIN med m ON s.grp = m.grp
),
mad AS (SELECT grp, median(dx2) AS mad2 FROM dx GROUP BY grp)
SELECT d.id, d.grp, d.vq AS value_q,
       round(d.med, 1) AS med,
       round(a.mad2 / 2.0, 2) AS mad,
       round(6745.0 * d.dx2 / (1.0e4 * a.mad2), 6) AS z
FROM dx d JOIN mad a ON d.grp = a.grp
WHERE CAST(a.mad2 * 2 AS BIGINT) > 0
  AND 6745 * d.dx2 * 2 > {10 * threshold_milli} * CAST(a.mad2 * 2 AS BIGINT)
"""


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Lower weighted median per group -> ``(grp, total_w, wmedian)``:
    the smallest value whose cumulative weight reaches half the group's
    total.  Weights must be non-negative integers (token counts, bytes,
    repetition multiplicities) so every decision is an exact integer
    comparison (``2 * cumw >= total_w`` — no halving of floats).

    The estimator behind "median document length weighted by tokens"
    and duplicate-aware robust centers (weight = occurrence count
    instead of exploding rows).  Plan: weights collapse per distinct
    value map-side (groupBy), then one cumulative window over distinct
    values per group — the sort sees |distinct values|, not |rows|.
    Groups with zero total weight return NULL.
    """
    per_val = df.groupBy(
        F.col(group_col).alias("grp"), F.col(value_col).alias("v")
    ).agg(F.sum(F.col(weight_col).cast("long")).alias("w"))
    wg = Window.partitionBy("grp")
    wc = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_val.select(
        "grp",
        "v",
        F.sum("w").over(wg).alias("total_w"),
        F.sum("w").over(wc).alias("cumw"),
    )
    hit = (
        cum.where(
            (F.col("total_w") > 0) & (2 * F.col("cumw") >= F.col("total_w"))
        )
        .groupBy("grp")
        .agg(F.max("total_w").alias("total_w"), F.min("v").alias("wmedian"))
    )
    totals = per_val.groupBy("grp").agg(F.sum("w").alias("total_w"))
    return (
        totals.join(hit.select("grp", "wmedian"), "grp", "left")
        .select("grp", "total_w", "wmedian")
    )


def weighted_median_sql(
    rel_sql: str,
    group_expr: str,
    value_expr: str,
    weight_expr: str,
) -> str:
    """DuckDB oracle for :func:`weighted_median`."""
    return f"""
WITH per_val AS (
  SELECT {group_expr} AS grp, {value_expr} AS v,
         SUM(CAST({weight_expr} AS BIGINT)) AS w
  FROM ({rel_sql}) GROUP BY 1, 2
), cum AS (
  SELECT grp, v,
         SUM(w) OVER (PARTITION BY grp) AS total_w,
         SUM(w) OVER (PARTITION BY grp ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
  FROM per_val
), hit AS (
  SELECT grp, MIN(v) AS wmedian
  FROM cum WHERE total_w > 0 AND 2 * cumw >= total_w GROUP BY grp
)
SELECT t.grp, t.total_w, hit.wmedian
FROM (SELECT grp, CAST(SUM(w) AS BIGINT) AS total_w
      FROM per_val GROUP BY grp) t
LEFT JOIN hit USING (grp)
"""


def trimmed_mean(
    df: DataFrame,
    value_col: str,
    *,
    trim: float = 0.05,
    lo: float,
    hi: float,
    bins: int = 2048,
    quant: int = 100,
) -> DataFrame:
    """Trimmed mean -> ONE row ``(n, n_kept, cut_lo, cut_hi, tmean)``:
    the mean of values between the ``trim`` and ``1-trim`` histogram
    quantiles — the outlier-robust location estimate that, unlike the
    median, still uses most of the data.

    The cut points are DETERMINISTIC bucket edges (the repo's
    histogram-quantile contract: left edge of the bucket holding the
    ceil(q·n)-th value), so both engines trim the identical row set;
    the kept-set mean is a ratio of exact quantized sums.  Two scans:
    one histogram, one filtered aggregate."""
    if not 0 < trim < 0.5:
        raise ValueError(f"trim must be in (0, 0.5), got {trim}")
    if quant < 1:
        raise ValueError(f"quant must be >= 1, got {quant}")
    from .sketches import hist_quantiles

    qs = hist_quantiles(
        df, value_col, [trim, 1.0 - trim], lo=lo, hi=hi, bins=bins
    )
    edges = qs.groupBy().pivot("q", [trim, 1.0 - trim]).agg(
        F.first("value")
    )
    c_lo, c_hi = edges.columns  # pivot names contain dots; re-alias
    edges = edges.select(
        F.col(f"`{c_lo}`").alias("cut_lo"),
        F.col(f"`{c_hi}`").alias("cut_hi"),
    )
    v = F.col(value_col).cast("double")
    x = F.round(v * quant).cast("decimal(38,0)")
    d = df.where(v.isNotNull()).crossJoin(F.broadcast(edges))
    kept = d.where((v >= F.col("cut_lo")) & (v <= F.col("cut_hi")))
    agg = kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(x).alias("_s"),
        F.first("cut_lo").alias("cut_lo"),
        F.first("cut_hi").alias("cut_hi"),
    )
    tot = df.where(v.isNotNull()).agg(F.count(F.lit(1)).alias("n"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "n",
        "n_kept",
        "cut_lo",
        "cut_hi",
        (
            F.col("_s").cast("double")
            / F.col("n_kept")
            / F.lit(float(quant))
        ).alias("tmean"),
    )


def trimmed_mean_sql(
    src_sql: str,
    expr: str,
    *,
    trim: float = 0.05,
    lo: float,
    hi: float,
    bins: int = 2048,
    quant: int = 100,
) -> str:
    """DuckDB oracle for :func:`trimmed_mean` — ``src_sql`` is the
    source relation, ``expr`` the value expression."""
    from .sketches import hist_quantiles_sql

    q_sql = hist_quantiles_sql(
        src_sql, expr, [trim, 1.0 - trim], lo=lo, hi=hi, bins=bins
    )
    return f"""
WITH qs AS ({q_sql}),
edges AS (
  SELECT min(CASE WHEN q = {float(trim)!r} THEN value END) AS cut_lo,
         min(CASE WHEN q = {float(1.0 - trim)!r} THEN value END) AS cut_hi
  FROM qs
),
src AS (SELECT CAST({expr} AS DOUBLE) AS v FROM ({src_sql})
        WHERE {expr} IS NOT NULL),
kept AS (
  SELECT CAST(ROUND(v * {quant}) AS DECIMAL(38,0)) AS x, cut_lo, cut_hi
  FROM src CROSS JOIN edges
  WHERE v >= cut_lo AND v <= cut_hi
)
SELECT (SELECT count(*) FROM src) AS n,
       count(*) AS n_kept,
       min(cut_lo) AS cut_lo, min(cut_hi) AS cut_hi,
       CAST(sum(x) AS DOUBLE) / count(*) / {float(quant)!r} AS tmean
FROM kept
"""
