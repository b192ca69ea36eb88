"""Key-salting helpers for skewed shuffles.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
:func:`polars_grouper_spark.session.get_spark`) already splits oversized
join partitions at runtime, and hash aggregation of algebraic functions
(sum/count/min/max/avg) combines map-side, so a hot group key is reduced
before it ever shuffles.  Two cases remain where one key can still pin a
single task at 100 TB, and those are what this module is for:

- **Holistic aggregations** — ``collect_list``, ``collect_set``, exact
  ``countDistinct`` — ship every row of a group to one reducer.
  :func:`salted_agg` splits each group across ``n_salts`` reducers with a
  random salt, then merges the per-salt partials in a second (tiny)
  aggregation.  The caller supplies the per-salt aggregation and the
  merge aggregation, because holistic merges are function-specific
  (``flatten ∘ collect_list`` for lists, etc.).
- **Skewed shuffle joins where the hot side cannot be broadcast** —
  :func:`salted_join` replicates the *small* side ``n_salts``× and salts
  the large side's key, so the hot key's rows spread over ``n_salts``
  tasks.  Use only when AQE's runtime split is unavailable (e.g. the
  skew is inside an aggregation-fed join AQE won't re-plan, or
  deterministic partitioning is required); replication multiplies the
  small side's shuffle volume by ``n_salts``.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """df + uniform random salt in [0, n_salts) (nondeterministic —
    evaluated once per row at shuffle time, never re-derived)."""
    return df.withColumn(SALT_COL, (F.rand() * n_salts).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Callable[[DataFrame], Sequence[Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for holistic aggregates over skewed keys.

    Phase 1 groups by (keys..., salt) — each hot group spreads over
    ``n_salts`` reducers.  Phase 2 groups the per-salt partials by the
    real keys; its input is ≤ n_salts rows per group, so the final
    shuffle is tiny regardless of skew.

    ``partial_aggs``: aggregate columns for phase 1 (aliased).
    ``merge_aggs``: given the phase-1 result, returns the aggregate
    columns for phase 2 (e.g. ``flatten(collect_list(x))`` to merge
    per-salt lists).
    """
    partial = with_salt(df, n_salts).groupBy(*keys, SALT_COL).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs(partial))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side's hot keys spread over ``n_salts``
    tasks.  ``small`` is replicated ``n_salts``× (explode over the salt
    range), so every (key, salt) bucket of the large side finds its match
    locally.  Output columns = the plain join's (salt dropped).
    """
    on = list(on)
    salted_large = with_salt(large, n_salts)
    salted_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_large.join(salted_small, [*on, SALT_COL], how).drop(SALT_COL)

def skew_report(
    df: DataFrame,
    key_col: str,
    *,
    top_k: int = 10,
) -> DataFrame:
    """Key-distribution diagnostic -> ONE row ``(n_rows, n_keys,
    top1_share, topk_share, max_key)``: how skewed is this join/agg key,
    BEFORE the shuffle that will suffer from it.

    ``top1_share`` is the heaviest key's row fraction — the number that
    decides between a plain shuffle, AQE skew splitting, and explicit
    salting (``salted_agg``/``salted_join``); ``max_key`` names the
    culprit.  Two map-side-combinable aggregations (per-key counts →
    global ordered stats); the per-key table never leaves the cluster.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    per_key = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).cast("string").alias("_k"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    totals = per_key.agg(
        F.sum("_n").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    # Top-k via orderBy().limit() — Spark's TakeOrdered does map-side
    # partial top-k, so the per-key table is NEVER globally sorted or
    # single-partitioned (a window over all keys would be).  The window
    # below runs over the <= top_k surviving rows only.
    topk = per_key.orderBy(F.col("_n").desc(), "_k").limit(top_k)
    w = Window.orderBy(F.col("_n").desc(), F.col("_k"))
    top_stats = topk.select(
        "_k", "_n", F.row_number().over(w).alias("_rk")
    ).agg(
        F.sum("_n").alias("_topk_n"),
        F.max(F.when(F.col("_rk") == 1, F.col("_n"))).alias("_top1_n"),
        F.max(F.when(F.col("_rk") == 1, F.col("_k"))).alias("max_key"),
    )
    return totals.crossJoin(top_stats).select(
        "n_rows",
        "n_keys",
        F.round(F.col("_top1_n") / F.col("n_rows"), 6).alias("top1_share"),
        F.round(F.col("_topk_n") / F.col("n_rows"), 6).alias("topk_share"),
        "max_key",
    )


def skew_report_sql(table_sql: str, key_expr: str, *, top_k: int = 10) -> str:
    """DuckDB oracle for :func:`skew_report`."""
    return f"""
WITH per_key AS (
  SELECT CAST({key_expr} AS VARCHAR) AS k, count(*)::BIGINT AS n
  FROM ({table_sql}) WHERE {key_expr} IS NOT NULL GROUP BY 1
),
ranked AS (
  SELECT k, n, row_number() OVER (ORDER BY n DESC, k) AS rk FROM per_key
)
SELECT sum(n)::BIGINT AS n_rows,
       count(*)::BIGINT AS n_keys,
       round(max(CASE WHEN rk = 1 THEN n END) / sum(n), 6) AS top1_share,
       round(sum(CASE WHEN rk <= {top_k} THEN n ELSE 0 END) / sum(n), 6)
         AS topk_share,
       max(CASE WHEN rk = 1 THEN k END) AS max_key
FROM ranked
"""
