"""Feature-preparation transforms: rank normalization, quantile
binning, class centroids.

Rank-based normalization is the workhorse scale-free feature transform
(robust to outliers and arbitrary monotone distortions — the reason
gradient-boosting and retrieval pipelines prefer it to z-scores on
heavy-tailed data).  Class centroids (mean vector per label) are the
prototype representation behind nearest-class-mean classifiers and the
seed step of clustering / dedup-by-class pipelines.

Determinism: ranks are decided by a TOTAL order (value, then id) so
ties never depend on partitioning; centroid means are emitted one row
per (label, dimension) with display rounding — membership/shape is
integer-decided, only printed values round.

Scale: rank windows shuffle once on the group key (a single global
group degenerates to one sorted partition — the documented bound, same
as any global sort); centroids are a posexplode + map-side-combinable
average, one scan, no joins.

Reference surface: none (beyond-reference operators, SURVEY.md §2
extension list).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank_normalize(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    id_col: str,
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Per-group rank features -> ``(id, grp, value, pct_rank, bin)``:
    ``pct_rank`` is ``percent_rank()`` over the total order (value, id)
    rounded to 6; ``bin`` is the ``ntile(n_bins)`` equi-depth bucket
    (1-based).  Null group/value/id rows drop."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    src = df.where(
        F.col(group_col).isNotNull() & v.isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.col(group_col).cast("string").alias("grp"),
        v.alias("value"),
    )
    w = Window.partitionBy("grp").orderBy("value", "id")
    return src.select(
        "id",
        "grp",
        "value",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.ntile(n_bins).over(w).cast("long").alias("bin"),
    )


def rank_normalize_sql(src_sql: str, *, n_bins: int = 10) -> str:
    """DuckDB oracle for :func:`rank_normalize` — ``src_sql`` yields
    (id, grp, value)."""
    return f"""
WITH src AS ({src_sql})
SELECT id, grp, value,
       round(percent_rank() OVER w, 6) AS pct_rank,
       CAST(ntile({n_bins}) OVER w AS BIGINT) AS bin
FROM src
WHERE id IS NOT NULL AND grp IS NOT NULL AND value IS NOT NULL
WINDOW w AS (PARTITION BY grp ORDER BY value, id)
"""


def class_centroids(
    df: DataFrame,
    label_col: str,
    vec_col: str = "embedding",
    *,
    decimals: int = 6,
) -> DataFrame:
    """Mean vector per label -> ``(label, dim, mean)`` rows (one per
    label x dimension — row form keeps the oracle comparison exact;
    reassemble with ``array_agg`` ordered by dim if an array is needed).
    Null labels/vectors drop."""
    return (
        df.where(F.col(label_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(
            F.col(label_col).cast("string").alias("label"),
            F.posexplode(F.col(vec_col)).alias("dim", "x"),
        )
        .groupBy("label", "dim")
        .agg(
            F.round(F.avg(F.col("x").cast("double")), decimals).alias("mean")
        )
        .select("label", F.col("dim").cast("long").alias("dim"), "mean")
    )


def class_centroids_sql(
    table_sql: str, label_expr: str, vec_expr: str, *, decimals: int = 6
) -> str:
    """DuckDB oracle for :func:`class_centroids`."""
    return f"""
WITH src AS ({table_sql}),
ex AS (
  SELECT CAST({label_expr} AS VARCHAR) AS label,
         generate_subscripts({vec_expr}, 1) - 1 AS dim,
         unnest({vec_expr})::DOUBLE AS x
  FROM src WHERE {label_expr} IS NOT NULL AND {vec_expr} IS NOT NULL
)
SELECT label, CAST(dim AS BIGINT) AS dim, round(avg(x), {decimals}) AS mean
FROM ex GROUP BY label, dim
"""
