"""2-D skyline (Pareto frontier) — bucket-pruned, no all-pairs join.

The skyline of a point set keeps every point not dominated by another
(dominated: some other point is >= on both axes and > on at least one).
Classic uses: best price-vs-recency orders, cost-vs-quality supplier
shortlists, model checkpoints on loss-vs-size.

The naive formulations both die at scale: the NOT-EXISTS self-join is
O(N²), and the textbook single-sort-then-scan needs a total order in
one task.  This operator prunes first:

1. reduce to one row per distinct x (keep max y) — one key shuffle;
2. bucket x into ``n_buckets`` fixed-width ranges (min/max from a 1-row
   broadcast aggregate) and take each bucket's max y — a second
   map-side-combinable aggregate producing <= n_buckets rows;
3. the exclusive suffix-max of bucket maxima (computed on the tiny
   bucket table) broadcasts back: any row whose y is <= the best y of a
   strictly-higher bucket is dominated by that bucket's witness and
   drops WITHOUT ever being compared row-to-row;
4. only the survivors — the skyline plus per-bucket near-frontier
   stragglers — pay the exact sorted cumulative-max pass.

Survivor count is data-dependent (anti-correlated axes are the worst
case: the whole set IS the skyline), so step 4 is guarded by
``max_candidates`` and raises rather than silently sorting a data-sized
set in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    n_buckets: int = 1024,
    max_candidates: int = 5_000_000,
) -> DataFrame:
    """Pareto frontier maximizing both columns -> distinct ``(x, y)``
    skyline points.  ``x_col`` must be numeric (it is range-bucketed);
    ``y_col`` needs only an ordering.  Null rows drop."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    x = F.col(x_col)
    y = F.col(y_col)
    g = (
        df.where(x.isNotNull() & y.isNotNull())
        .groupBy(x.alias("x"))
        .agg(F.max(y).alias("y"))
    )
    mm = g.agg(F.min("x").alias("_lo"), F.max("x").alias("_hi"))
    d = g.crossJoin(F.broadcast(mm))
    span = F.col("_hi") - F.col("_lo")
    width = F.when(span > 0, span / F.lit(n_buckets)).otherwise(F.lit(1.0))
    d = d.withColumn(
        "_bkt",
        F.least(
            F.floor((F.col("x") - F.col("_lo")) / width), F.lit(n_buckets - 1)
        ).cast("int"),
    ).drop("_lo", "_hi")
    # best y per bucket, then the exclusive max over strictly-higher
    # buckets — a window over <= n_buckets rows, bounded by construction.
    bmax = d.groupBy("_bkt").agg(F.max("y").alias("_by"))
    w_b = (
        Window.orderBy(F.col("_bkt").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bpre = bmax.select("_bkt", F.max("_by").over(w_b).alias("_hi_y"))
    cand = d.join(F.broadcast(bpre), "_bkt").where(
        F.col("_hi_y").isNull() | (F.col("y") > F.col("_hi_y"))
    )
    n_cand = cand.count()
    if n_cand > max_candidates:
        raise RuntimeError(
            f"skyline candidate set ({n_cand}) exceeds max_candidates="
            f"{max_candidates}; axes are likely anti-correlated — raise the "
            "cap or pre-aggregate"
        )
    # exact pass over the pruned survivors: x strictly greater ==
    # strictly preceding rows after the per-x reduction.
    w_x = (
        Window.orderBy(F.col("x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.max("y").over(w_x)
    return (
        cand.select("x", "y", prev.alias("_prev"))
        .where(F.col("_prev").isNull() | (F.col("y") > F.col("_prev")))
        .select("x", "y")
    )


def skyline_2d_sql(src_sql: str) -> str:
    """DuckDB oracle for :func:`skyline_2d` — ``src_sql`` yields (x, y);
    deliberately the brute-force NOT-EXISTS formulation, so any recall
    loss in the bucket pruning breaks the compare."""
    return f"""
WITH src AS ({src_sql}),
g AS (SELECT x, max(y) AS y FROM src
      WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY x)
SELECT x, y FROM g p
WHERE NOT EXISTS (SELECT 1 FROM g q WHERE q.x > p.x AND q.y >= p.y)
"""
