"""Per-group ordinary-least-squares trend fit from exact integer
moments.

"Is this user's spend trending up?  Is this endpoint's latency
drifting?" — a slope per key over time.  OLS needs only five moments
(n, Σx, Σy, Σxy, Σx²), all map-side-combinable sums, so the whole fit
is ONE aggregation per group — no iteration, no collect, and the
moments themselves are a mergeable state (two batches' moments add,
same contract as ``functions.incremental``).

Determinism: the caller supplies integer x (e.g. days since epoch) and
integer-quantized y, so every moment is an exact 64-bit sum in any
aggregation order; slope/intercept are single divisions of exact
integers, display-rounded.  Degenerate groups (fewer than 2 points, or
all x equal) are emitted with NULL slope/intercept rather than
dropped — "no trend computable" is an answer, not a missing row.

Overflow bound: |Σxy| <= n·max|x|·max|y|; with x as day offsets (~10³)
and y in milli-units (~10⁹) a trillion rows per group still fits long.
Rescale x before calling if it is epoch-micros-sized.

Reference surface: none (beyond-reference operator, SURVEY.md §2
extension list).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_trend(
    df: DataFrame,
    group_col: str,
    x_col: Column | str,
    y_col: Column | str,
    *,
    decimals: int = 6,
) -> DataFrame:
    """Per-group OLS fit -> ``(grp, n, slope, intercept)``:
    ``slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)``,
    ``intercept = (Σy − slope·Σx) / n``.  Null group/x/y rows drop."""
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("long")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("long")
    src = df.where(
        F.col(group_col).isNotNull() & x.isNotNull() & y.isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("grp"),
        x.alias("x"),
        y.alias("y"),
    )
    m = src.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / den.cast("double")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n").cast("double")
    ok = den > 0
    return m.select(
        "grp",
        "n",
        F.round(F.when(ok, slope), decimals).alias("slope"),
        F.round(F.when(ok, intercept), decimals).alias("intercept"),
    )


def group_trend_sql(src_sql: str, *, decimals: int = 6) -> str:
    """DuckDB oracle for :func:`group_trend` — ``src_sql`` yields
    (grp, x, y) with integer x/y."""
    return f"""
WITH src AS ({src_sql}),
m AS (
  SELECT CAST(grp AS VARCHAR) AS grp, count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx
  FROM src WHERE grp IS NOT NULL AND x IS NOT NULL AND y IS NOT NULL
  GROUP BY 1
)
SELECT grp, n,
       round(CASE WHEN n * sxx - sx * sx > 0
                  THEN (n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE)
             END, {decimals}) AS slope,
       round(CASE WHEN n * sxx - sx * sx > 0
                  THEN (sy - ((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / CAST(n AS DOUBLE)
             END, {decimals}) AS intercept
FROM m
"""


def theil_sen(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    *,
    max_group_rows: int = 2000,
) -> DataFrame:
    """Theil-Sen robust trend per group -> ``(grp, n_points, n_pairs,
    slope)``: the median over all pairwise slopes ``(y_j - y_i) /
    (x_j - x_i)`` with distinct x — the 29%-breakdown estimator that a
    single wild outlier cannot move, where OLS (:func:`group_trend`)
    bends to it.

    The pair set is O(n²) per group BY DEFINITION, so this operator is
    honest about its regime: groups larger than ``max_group_rows``
    raise (lazily, inside the plan — no extra scan) instead of quietly
    joining billions of pairs; for bigger groups, pre-aggregate x (e.g.
    daily means) or use :func:`group_trend`.  Median-by-value makes
    slope ties harmless (equal values yield the same median under any
    order); an even pair count averages the two middle slopes — one
    add + one halving of identical doubles on both engines.
    """
    if max_group_rows < 2:
        raise ValueError(f"max_group_rows must be >= 2, got {max_group_rows}")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    counts = base.groupBy("grp").agg(F.count(F.lit(1)).alias("_gc"))
    guard = F.when(
        F.col("_gc") > max_group_rows,
        F.raise_error(
            F.concat(
                F.lit(
                    "theil_sen: group exceeds max_group_rows="
                    f"{max_group_rows}: "
                ),
                F.col("grp").cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.lit(0))
    checked = base.join(F.broadcast(counts), "grp").where(guard == 0)
    a = checked.alias("a")
    b = checked.alias("b")
    slopes = (
        a.join(b, "grp")
        .where(F.col("a.x") < F.col("b.x"))
        .select(
            "grp",
            (
                (F.col("b.y") - F.col("a.y"))
                / (F.col("b.x") - F.col("a.x"))
            ).alias("s"),
        )
    )
    w = Window.partitionBy("grp").orderBy("s")
    ranked = slopes.select(
        "grp",
        "s",
        F.row_number().over(w).alias("_r"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("_np"),
    )
    lo = (F.col("_np") + 1) / 2
    hi = (F.col("_np") + 2) / 2
    med = (
        ranked.where(
            (F.col("_r") == F.floor(lo)) | (F.col("_r") == F.floor(hi))
        )
        .groupBy("grp")
        .agg(
            F.max("_np").alias("n_pairs"),
            (F.sum("s") / F.count(F.lit(1))).alias("slope"),
        )
    )
    return (
        counts.select("grp", F.col("_gc").alias("n_points"))
        .join(med, "grp", "left")
        .select("grp", "n_points", "n_pairs", "slope")
    )


def theil_sen_sql(
    rel_sql: str,
    group_expr: str,
    x_expr: str,
    y_expr: str,
) -> str:
    """DuckDB oracle for :func:`theil_sen` (same pair set and median
    positions; the size guard is Spark-side only)."""
    return f"""
WITH base AS (
  SELECT {group_expr} AS grp, CAST({x_expr} AS DOUBLE) AS x,
         CAST({y_expr} AS DOUBLE) AS y
  FROM ({rel_sql})
), slopes AS (
  SELECT a.grp, (b.y - a.y) / (b.x - a.x) AS s
  FROM base a JOIN base b ON a.grp = b.grp AND a.x < b.x
), ranked AS (
  SELECT grp, s,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY s) AS r,
         COUNT(*) OVER (PARTITION BY grp) AS np
  FROM slopes
), med AS (
  SELECT grp, MAX(np) AS n_pairs, SUM(s) / COUNT(*) AS slope
  FROM ranked
  WHERE r = CAST(FLOOR((np + 1) / 2.0) AS BIGINT)
     OR r = CAST(FLOOR((np + 2) / 2.0) AS BIGINT)
  GROUP BY grp
)
SELECT c.grp, c.n_points, med.n_pairs, med.slope
FROM (SELECT grp, COUNT(*) AS n_points FROM base GROUP BY grp) c
LEFT JOIN med USING (grp)
"""
