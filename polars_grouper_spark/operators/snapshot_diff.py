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

from pyspark.sql import DataFrame, Window
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


def scd2_history(
    snapshots: DataFrame,
    key_cols: "list[str]",
    attr_cols: "list[str]",
    version_col: str,
) -> DataFrame:
    """Collapse a pile of keyed snapshots into SCD type-2 validity
    ranges -> ``(*key_cols, *attr_cols, valid_from, valid_to,
    n_versions)``: one row per maximal run of consecutive versions over
    which the attributes were unchanged.  ``valid_to`` is the last
    version the row was observed with those attributes (closed range;
    the currently-live row is the one whose ``valid_to`` equals the
    key's max version).  ``n_versions`` counts the snapshots in the run.

    The standard warehouse history build, expressed as the gaps-and-
    islands idiom — fully relational, no collect, no iteration:

    1. ``lag`` each attribute over (key, version order);
    2. a run starts where ANY attribute differs from its lag (null-safe:
       NULL vs NULL is no change, NULL vs value is) or there is no lag;
    3. a running sum of start flags numbers the runs; group by run.

    Two window passes over data partitioned by key plus one aggregation —
    at 100 TB all three shuffle on the key; skewed keys (one entity with
    millions of versions) are the watch-point, and AQE's skew handling
    applies to the final group-by but windows concentrate a key in one
    task (same caveat as the star-step window in connected components).
    """
    if not key_cols or not attr_cols:
        raise ValueError("scd2_history needs key and attribute columns")
    w = Window.partitionBy(*key_cols).orderBy(version_col)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    start = F.when(
        F.lag(version_col).over(w).isNull() | changed, F.lit(1)
    ).otherwise(F.lit(0))
    runs = snapshots.select(
        *key_cols,
        *attr_cols,
        F.col(version_col).alias("_v"),
        start.alias("_start"),
    ).select(
        *key_cols,
        *attr_cols,
        "_v",
        F.sum("_start")
        .over(Window.partitionBy(*key_cols).orderBy("_v"))
        .alias("_run"),
    )
    return runs.groupBy(*key_cols, "_run", *attr_cols).agg(
        F.min("_v").alias("valid_from"),
        F.max("_v").alias("valid_to"),
        F.count(F.lit(1)).alias("n_versions"),
    ).drop("_run")


def scd2_history_sql(
    src_sql: str,
    key_cols: "list[str]",
    attr_cols: "list[str]",
    version_col: str,
) -> str:
    """DuckDB oracle replaying :func:`scd2_history` (same gaps-and-
    islands formulation)."""
    keys = ", ".join(key_cols)
    attrs = ", ".join(attr_cols)
    change = " OR ".join(
        f"NOT ({c} IS NOT DISTINCT FROM lag({c}) OVER w)" for c in attr_cols
    )
    return f"""
WITH src AS ({src_sql}),
flagged AS (
  SELECT {keys}, {attrs}, {version_col} AS _v,
         CASE WHEN lag({version_col}) OVER w IS NULL OR {change}
              THEN 1 ELSE 0 END AS _start
  FROM src
  WINDOW w AS (PARTITION BY {keys} ORDER BY {version_col})
),
runs AS (
  SELECT {keys}, {attrs}, _v,
         sum(_start) OVER (PARTITION BY {keys} ORDER BY _v) AS _run
  FROM flagged
)
SELECT {keys}, {attrs},
       min(_v) AS valid_from, max(_v) AS valid_to,
       count(*)::BIGINT AS n_versions
FROM runs GROUP BY {keys}, _run, {attrs}
"""


def scd2_asof(
    history: DataFrame,
    key_cols: "list[str]",
    version: int,
) -> DataFrame:
    """Time travel over an SCD2 history: the state as of ``version`` ->
    one row per key that existed by then (its run with the greatest
    ``valid_from <= version``).  Runs are disjoint per key and a value
    persists until the next change, so the as-of row is a single
    argmax — one window over the HISTORY table (runs-sized, already a
    fraction of the raw snapshots), never a rescan of the snapshots.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col("valid_from").desc())
    return (
        history.where(F.col("valid_from") <= version)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def scd2_asof_sql(
    history_sql: str,
    key_cols: "list[str]",
    version: int,
) -> str:
    """DuckDB oracle for :func:`scd2_asof`."""
    keys = ", ".join(key_cols)
    return f"""
SELECT * EXCLUDE (_rn) FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY {keys}
    ORDER BY valid_from DESC) AS _rn
  FROM ({history_sql}) WHERE valid_from <= {version}
) WHERE _rn = 1
"""


def column_change_stats(
    old: DataFrame,
    new: DataFrame,
    key_cols: "list[str]",
    cols: "list[str]",
) -> DataFrame:
    """WHICH columns are churning between two snapshots -> one row per
    column ``(column, n_compared, n_changed, change_rate)``.

    :func:`snapshot_diff` says WHAT rows changed; this says what
    UPSTREAM FIELD is doing the churning — the drill-down that turns
    "2% of rows changed" into "someone re-encoded the segment column".
    One inner join on the key + ONE aggregation with a null-safe
    inequality sum per column, unpivoted to rows (adding a column adds
    an expression, not a pass).
    """
    if not cols:
        raise ValueError("column_change_stats needs at least one column")
    o = old.select(
        *key_cols, *[F.col(c).alias(f"_o_{c}") for c in cols]
    )
    n = new.select(
        *key_cols, *[F.col(c).alias(f"_n_{c}") for c in cols]
    )
    joined = o.join(n, key_cols)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(
            F.sum(
                (~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))).cast("long")
            ).alias(f"_ch_{c}")
        )
    wide = joined.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_ch_{c}").alias("n_changed"),
            )
            for c in cols
        ]
    )
    return wide.select(
        F.col("_n").alias("n_compared"), F.explode(pairs).alias("p")
    ).select(
        F.col("p.column").alias("column"),
        "n_compared",
        F.col("p.n_changed").alias("n_changed"),
        (F.col("p.n_changed") / F.col("n_compared").cast("double")).alias(
            "change_rate"
        ),
    )


def column_change_stats_sql(
    old_sql: str,
    new_sql: str,
    key_cols: "list[str]",
    cols: "list[str]",
) -> str:
    """DuckDB oracle for :func:`column_change_stats`."""
    cond = " AND ".join(f"o.{k} = n.{k}" for k in key_cols)
    sums = ", ".join(
        f"SUM(CASE WHEN o.{c} IS DISTINCT FROM n.{c} THEN 1 ELSE 0 END)"
        f" AS ch_{c}"
        for c in cols
    )
    arms = " UNION ALL ".join(
        f"SELECT '{c}' AS column, n_compared, "
        f"CAST(ch_{c} AS BIGINT) AS n_changed, "
        f"ch_{c} / CAST(n_compared AS DOUBLE) AS change_rate FROM wide"
        for c in cols
    )
    return f"""
WITH wide AS (
  SELECT COUNT(*) AS n_compared, {sums}
  FROM ({old_sql}) o JOIN ({new_sql}) n ON {cond}
)
{arms}
"""
