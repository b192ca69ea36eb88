"""Mergeable partial-aggregate state for incremental pipelines.

The 100 TB pattern behind every daily-batch rollup: never re-scan
history.  Each batch (day, hour, partition) reduces to a tiny STATE
table — count / sum / min / max per key — and any coarser rollup
(month, whole-corpus, per-segment) is a merge of states: counts and sums
add, mins/maxes combine.  The algebra is exactly Spark's own partial
aggregation, materialized at a batch boundary so tomorrow's pipeline
touches yesterday only through its state rows.

The incremental property this module pins (``tests/test_incremental.py``):

    state(A ∪ B) == merge(state(A), state(B))        (batches compose)
    finalize(merge(daily states)) == direct aggregate  (no-rescan rollup)

Sums are over caller-quantized integers (the repo convention), so the
merge is exact and associative in any order — float partial sums would
make the merged state order-dependent.  The companion sketch states
(``sketches.hll_registers`` for distinct counts, ``cms_counts`` for
frequencies, ``bloom_bits`` for membership) follow the same contract and
merge by max / sum / union respectively.

Reference surface: none (beyond-reference operator, SURVEY.md §2
extension list).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("n", "sum_q", "min_q", "max_q")


def agg_state(
    df: DataFrame, keys: Sequence[str], value_col: Column | str
) -> DataFrame:
    """Partial-aggregate state per key tuple ->
    ``(*keys, n, sum_q, min_q, max_q)``.  ``value_col`` must be
    integer-quantized by the caller; null values drop (they would poison
    min/max and contribute nothing to sums)."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return (
        df.where(v.isNotNull())
        .select(*keys, v.cast("long").alias("_v"))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_v").alias("sum_q"),
            F.min("_v").alias("min_q"),
            F.max("_v").alias("max_q"),
        )
    )


def merge_agg_state(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge state rows down to coarser ``keys`` (a subset / derivation
    of the original keys, already present as columns): counts and sums
    add, mins/maxes combine.  Associative and commutative — batches
    merge in any order."""
    return state.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_q").alias("sum_q"),
        F.min("min_q").alias("min_q"),
        F.max("max_q").alias("max_q"),
    )


def finalize_state(
    state: DataFrame, *, scale: float = 1.0, mean_decimals: int = 6
) -> DataFrame:
    """Human units from quantized state: adds ``mean`` (display-rounded;
    the state itself stays exact) and de-quantizes sum/min/max by
    ``scale``."""
    return state.select(
        *[c for c in state.columns if c not in ("sum_q", "min_q", "max_q")],
        (F.col("sum_q") / F.lit(scale)).alias("sum_v"),
        (F.col("min_q") / F.lit(scale)).alias("min_v"),
        (F.col("max_q") / F.lit(scale)).alias("max_v"),
        F.round(
            F.col("sum_q") / (F.lit(scale) * F.col("n")), mean_decimals
        ).alias("mean_v"),
    )


def delta_join(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    on: "Sequence[str]",
) -> DataFrame:
    """Incremental JOIN-view maintenance: the NEW rows a materialized
    inner-join view gains when append-only deltas arrive on both sides.

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    The 100 TB point: refreshing ``view = A ⋈ B`` after a daily append
    costs delta-sized joins (each term has a delta on at least one
    side, which broadcasts when small), never the full A ⋈ B recompute
    — the join analogue of :func:`merge_agg_state`'s no-rescan rollup.
    Appending the result to the stored view reproduces the full join of
    the updated tables exactly (pinned by ``tests``/the oracle):

        (A∪ΔA) ⋈ (B∪ΔB) = (A ⋈ B) ∪ Δ(A ⋈ B)

    Inner-join, append-only semantics (no retractions); for updates,
    route through :mod:`..operators.upsert` first and feed the
    net-new rows here.  Column layout: A's columns then B's non-key
    columns, as with a plain ``join(on)``."""
    keys = list(on)
    return (
        delta_a.join(base_b, keys)
        .unionByName(base_a.join(delta_b, keys))
        .unionByName(delta_a.join(delta_b, keys))
    )


def delta_join_sql(
    base_a_sql: str,
    delta_a_sql: str,
    base_b_sql: str,
    delta_b_sql: str,
    on: "Sequence[str]",
    a_cols: "Sequence[str]",
    b_cols: "Sequence[str]",
) -> str:
    """DuckDB oracle for :func:`delta_join` (same three delta terms).
    ``a_cols``/``b_cols``: output columns taken from each side
    (``b_cols`` excluding the join keys)."""
    keys = list(on)
    cond = " AND ".join(f"a.{k} = b.{k}" for k in keys)
    cols = ", ".join(
        [f"a.{c}" for c in a_cols] + [f"b.{c}" for c in b_cols]
    )
    term = (
        "SELECT {cols} FROM ({left}) a JOIN ({right}) b ON {cond}"
    )
    return "\nUNION ALL\n".join(
        term.format(cols=cols, left=l, right=r, cond=cond)
        for l, r in (
            (delta_a_sql, base_b_sql),
            (base_a_sql, delta_b_sql),
            (delta_a_sql, delta_b_sql),
        )
    )
