"""Greedy maximum-coverage corpus selection.

"Pick k documents that together cover as much distinct vocabulary /
shingle mass as possible" — the classic submodular data-selection
primitive behind diverse-subset picking for training mixtures, eval-set
construction, and seed-corpus bootstrapping.  Greedy is the canonical
algorithm: (1 − 1/e)-optimal for any monotone submodular objective
(Nemhauser et al. 1978), and embarrassingly distributable per round.

Round structure (k rounds, 2 jobs each): score every candidate by its
UNCOVERED-element count (one anti join of the (doc, element) table
against the covered-element set + one per-doc count), pick the argmax
via ``orderBy().limit(1)`` (TakeOrdered — never a global sort), fold
the winner's elements into the covered set.  The covered set is the
only growing state — bounded by the universe, lineage-truncated per
round.  Ties break on the smaller doc id; selection stops early when
the best marginal gain hits zero (adding such a doc is pure noise).

At 100 TB the (doc, element) table is the big input; each round's anti
join shuffles on the ELEMENT key, and the covered side stays a
fraction of the universe — the same posture as incremental dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.iteration import truncate_lineage


def greedy_coverage(
    df: DataFrame,
    id_col: str,
    element_col: str,
    k: int,
) -> "list[tuple[int, str, int]]":
    """Select up to ``k`` ids greedily maximizing distinct-element
    coverage -> ``[(rank, id, gain)]`` (gain = newly-covered elements
    at pick time; list shorter than k if coverage saturates).

    Returned as a driver list (k rows — metadata, the point of the
    operator is that k is small); build a DataFrame from it for joins.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ds = truncate_lineage(
        df.where(F.col(id_col).isNotNull() & F.col(element_col).isNotNull())
        .select(
            F.col(id_col).cast("string").alias("id"),
            F.col(element_col).cast("string").alias("el"),
        )
        .distinct()
    )
    covered = None
    picks: "list[tuple[int, str, int]]" = []
    for rank in range(1, k + 1):
        remaining = (
            ds if covered is None else ds.join(covered, "el", "left_anti")
        )
        top = (
            remaining.groupBy("id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.col("gain").desc(), "id")
            .limit(1)
            .collect()
        )
        if not top or top[0]["gain"] == 0:
            break
        pick_id, gain = top[0]["id"], int(top[0]["gain"])
        picks.append((rank, pick_id, gain))
        new_cov = ds.where(F.col("id") == pick_id).select("el").distinct()
        covered = truncate_lineage(
            new_cov if covered is None else covered.union(new_cov).distinct()
        )
    return picks


def greedy_coverage_sql(
    pairs_sql: str, k: int
) -> str:
    """DuckDB oracle replaying :func:`greedy_coverage` round for round —
    ``pairs_sql`` yields ``(id, el)``; result is ``(rank, id, gain)``."""
    parts = [
        f"""WITH ds AS (
  SELECT DISTINCT CAST(id AS VARCHAR) AS id, CAST(el AS VARCHAR) AS el
  FROM ({pairs_sql}) WHERE id IS NOT NULL AND el IS NOT NULL
)"""
    ]
    prev_cov = None
    pick_tables = []
    for i in range(1, k + 1):
        rem = (
            "ds"
            if prev_cov is None
            else f"(SELECT ds.* FROM ds ANTI JOIN {prev_cov} USING (el))"
        )
        parts.append(
            f""", p{i} AS (
  SELECT {i} AS rank, id, count(*)::BIGINT AS gain
  FROM {rem} GROUP BY id HAVING count(*) > 0
  ORDER BY gain DESC, id LIMIT 1
), c{i} AS (
  {"SELECT el FROM ds SEMI JOIN p" + str(i) + " USING (id)"
   if prev_cov is None
   else f"SELECT el FROM {prev_cov} UNION SELECT ds.el FROM ds SEMI JOIN p{i} USING (id)"}
)"""
        )
        pick_tables.append(f"SELECT * FROM p{i}")
        prev_cov = f"c{i}"
    parts.append(" " + " UNION ALL ".join(pick_tables))
    return "\n".join(parts)


def budget_select(
    df: DataFrame,
    id_col: str,
    score_col: str,
    cost_col: str,
    budget: int,
    *,
    coarse_buckets: int | None = 1000,
) -> DataFrame:
    """Best-first selection under a budget -> the kept rows
    ``(id, score, cost, cum_cost)``: take rows in (score desc, id asc)
    order while the running ``cost`` total stays <= ``budget``.

    The LLM-data move this encodes: "fill a 50B-token budget with the
    highest-quality documents" — the greedy solution to the knapsack
    with uniform value density, and the standard way quality scores
    become a corpus.

    Scale: the naive plan is a GLOBAL cumsum window (single-partition
    sort over everything).  With ``coarse_buckets`` set (score must be
    in [0, 1]), a first map-side-combinable aggregation reduces the
    data to per-bucket cost totals (metadata-sized), a running total
    over that tiny table finds the boundary bucket, and only rows at or
    above it — roughly budget-sized, not corpus-sized — reach the exact
    sort.  Output is provably identical: a row below the boundary
    bucket has every higher-ordered row's cost already summing past the
    budget, so it can never be kept.  ``cost_col`` must be integral and
    non-negative (token counts, bytes).

    Out-of-domain scores (ADVICE r5): NULL scores are DROPPED (both
    here and in the oracle — an unscored row has no rank); scores
    outside [0, 1] clamp into the edge buckets (the histogram-clamp
    convention), so negative-score rows stay in the ranking instead of
    silently vanishing from the bucket semi-join.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    base = df.where(F.col(score_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(score_col).cast("double").alias("score"),
        F.col(cost_col).cast("long").alias("cost"),
    )
    pool = base
    if coarse_buckets is not None:
        if coarse_buckets < 2:
            raise ValueError(
                f"coarse_buckets must be >= 2, got {coarse_buckets}"
            )
        b = F.greatest(
            F.lit(0).cast("long"),
            F.least(
                F.floor(F.col("score") * coarse_buckets).cast("long"),
                F.lit(coarse_buckets - 1),
            ),
        )
        buckets = (
            base.groupBy(b.alias("_b"))
            .agg(F.sum("cost").alias("_bc"))
            .select(
                "_b",
                (
                    F.sum("_bc").over(
                        Window.orderBy(F.col("_b").desc()).rowsBetween(
                            Window.unboundedPreceding, -1
                        )
                    )
                ).alias("_above"),
            )
            # bucket participates iff strictly-higher buckets alone do not
            # already exceed the budget (<=, not <: a zero-cost row can
            # still land exactly on the budget)
            .where(F.coalesce(F.col("_above"), F.lit(0)) <= budget)
            .select("_b")
        )
        pool = base.join(F.broadcast(buckets), b == F.col("_b"), "left_semi")
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        pool.select("id", "score", "cost", F.sum("cost").over(w).alias("cum_cost"))
        .where(F.col("cum_cost") <= budget)
    )


def budget_select_sql(
    rel_sql: str,
    id_expr: str,
    score_expr: str,
    cost_expr: str,
    budget: int,
) -> str:
    """DuckDB oracle for :func:`budget_select` — the plain global
    cumsum-filter the bucket-pruned plan is provably equal to."""
    return f"""
WITH ranked AS (
  SELECT {id_expr} AS id, CAST({score_expr} AS DOUBLE) AS score,
         CAST({cost_expr} AS BIGINT) AS cost,
         CAST(SUM(CAST({cost_expr} AS BIGINT)) OVER (
           ORDER BY CAST({score_expr} AS DOUBLE) DESC, {id_expr} ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cost
  FROM ({rel_sql}) WHERE {score_expr} IS NOT NULL
)
SELECT id, score, cost, cum_cost FROM ranked WHERE cum_cost <= {budget}
"""
