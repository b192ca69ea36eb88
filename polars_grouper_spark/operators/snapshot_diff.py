"""Snapshot diff — change-data-capture classification between two
keyed table versions.

Incremental pipelines (SCD2 upserts, delta publishing, cache
invalidation) start from "what changed between yesterday's snapshot and
today's?".  Given two frames keyed by ``key_cols``, classify every key:

- ``added``     — key only in the new snapshot,
- ``removed``   — key only in the old snapshot,
- ``changed``   — key in both, any compared column differs
  (NULL-safe: NULL vs NULL is equal, NULL vs value is a change),
- ``unchanged`` — key in both, all compared columns equal (emitted only
  with ``include_unchanged=True`` — at 100 TB the unchanged set IS the
  table; the default output is delta-sized).

One full outer join on the key, comparisons inside whole-stage codegen
via null-safe equality (``<=>``); no collect, no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: "list[str]",
    compare_cols: "list[str]",
    *,
    include_unchanged: bool = False,
) -> DataFrame:
    """Per-key change classification ->
    ``(*key_cols, change, n_diff_cols)`` where ``n_diff_cols`` counts the
    compared columns that differ (0 for added/removed/unchanged)."""
    if not key_cols:
        raise ValueError("snapshot_diff needs at least one key column")
    if not compare_cols:
        raise ValueError("snapshot_diff needs at least one compare column")
    o = old.select(
        *[F.col(k).alias(f"k_{k}") for k in key_cols],
        *[F.col(c).alias(f"o_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"k_{k}") for k in key_cols],
        *[F.col(c).alias(f"n_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    joined = o.join(n, [f"k_{k}" for k in key_cols], "full_outer")
    diff_flags = [
        (~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}"))).cast("int")
        for c in compare_cols
    ]
    n_diff = sum(diff_flags[1:], diff_flags[0])
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(n_diff > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        *[F.col(f"k_{k}").alias(k) for k in key_cols],
        change.alias("change"),
        F.when(
            F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull(), n_diff
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_diff_cols"),
    )
    if not include_unchanged:
        out = out.where(F.col("change") != "unchanged")
    return out


def snapshot_diff_sql(
    old_sql: str,
    new_sql: str,
    key_cols: "list[str]",
    compare_cols: "list[str]",
    *,
    include_unchanged: bool = False,
) -> str:
    """DuckDB oracle replaying :func:`snapshot_diff`."""
    keys = ", ".join(key_cols)
    on = " AND ".join(f"o.{k} IS NOT DISTINCT FROM n.{k}" for k in key_cols)
    key_out = ", ".join(f"coalesce(o.{k}, n.{k}) AS {k}" for k in key_cols)
    diffs = " + ".join(
        f"(CASE WHEN o.{c} IS DISTINCT FROM n.{c} THEN 1 ELSE 0 END)"
        for c in compare_cols
    )
    pred = "" if include_unchanged else "WHERE change <> 'unchanged'"
    return f"""
WITH o AS (SELECT *, 1 AS _in_old FROM ({old_sql})),
n AS (SELECT *, 1 AS _in_new FROM ({new_sql})),
j AS (
  SELECT {key_out},
         o._in_old, n._in_new,
         CASE WHEN o._in_old IS NULL THEN 'added'
              WHEN n._in_new IS NULL THEN 'removed'
              WHEN ({diffs}) > 0 THEN 'changed'
              ELSE 'unchanged' END AS change,
         CASE WHEN o._in_old IS NOT NULL AND n._in_new IS NOT NULL
              THEN ({diffs}) ELSE 0 END::BIGINT AS n_diff_cols
  FROM o FULL OUTER JOIN n ON {on}
)
SELECT {keys}, change, n_diff_cols FROM j {pred}
"""
