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

from pyspark.sql import Column, DataFrame
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
