"""Interval concurrency via the sweep-line idiom.

"How many sessions/calls/jobs were active at once?" — the classic
interval-overlap aggregation.  The naive self-join is O(N²); the sweep
line is two rows per interval (+1 at start, −1 past end) and one
cumulative sum in event order — O(N log N) via sort, no join at all.

Grouped sweeps (per day / per tenant) are embarrassingly parallel: the
window partitions on the group key.  A single GLOBAL sweep is an
inherently sequential prefix sum — same posture as sequence packing:
partition the timeline first (the counts at partition boundaries can be
stitched with per-partition offsets if a truly global answer is
needed).

Tie rule (documented, mirrored by the oracle): intervals are CLOSED —
at the same tick, starts apply before ends, so an interval ending at t
and another starting at t DO overlap.  The sweep orders by
``(t, delta DESC)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def peak_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    group_col: "str | None" = None,
) -> DataFrame:
    """Per-group peak concurrency -> ``([group,] peak, n_intervals)``:
    the maximum number of simultaneously active closed intervals.

    Sweep with the closed-interval tie rule: process all +1s at a tick,
    take the running max, then the −1s — implemented as a cumulative sum
    over per-tick (starts, ends) aggregates where the during-tick count
    is ``cum_starts(≤ t) − cum_ends(< t)``; both cumulative sums are
    windows over the per-tick aggregate table (two rows per interval at
    most), never the raw data twice."""
    s, e = F.col(start_col), F.col(end_col)
    base = df.where(s.isNotNull() & e.isNotNull() & (e >= s))
    gcols = [group_col] if group_col else []
    ticks = (
        base.select(*gcols, s.alias("t"), F.lit(1).alias("st"), F.lit(0).alias("en"))
        .unionAll(
            base.select(*gcols, e.alias("t"), F.lit(0).alias("st"), F.lit(1).alias("en"))
        )
        .groupBy(*gcols, "t")
        .agg(F.sum("st").alias("starts"), F.sum("en").alias("ends"))
    )
    w_incl = Window.partitionBy(*gcols).orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_excl = Window.partitionBy(*gcols).orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    during = ticks.select(
        *gcols,
        "t",
        (
            F.sum("starts").over(w_incl)
            - F.coalesce(F.sum("ends").over(w_excl), F.lit(0))
        ).alias("concurrent"),
    )
    agg_cols = [
        F.max("concurrent").cast("long").alias("peak"),
    ]
    n = base.groupBy(*gcols).agg(F.count(F.lit(1)).alias("n_intervals"))
    peaks = during.groupBy(*gcols).agg(*agg_cols)
    if gcols:
        return peaks.join(n, gcols)
    return peaks.crossJoin(n)


def peak_concurrency_sql(
    table_sql: str,
    start_expr: str,
    end_expr: str,
    group_expr: "str | None" = None,
) -> str:
    """DuckDB oracle replaying :func:`peak_concurrency`."""
    g_sel = f"{group_expr} AS grp, " if group_expr else ""
    g_cols = "grp, " if group_expr else ""
    g_part = "PARTITION BY grp " if group_expr else ""
    g_group = "GROUP BY grp" if group_expr else ""
    g_join = "USING (grp)" if group_expr else "ON TRUE"
    return f"""
WITH base AS (
  SELECT {g_sel}{start_expr} AS s, {end_expr} AS e
  FROM ({table_sql})
  WHERE {start_expr} IS NOT NULL AND {end_expr} IS NOT NULL
    AND {end_expr} >= {start_expr}
),
ticks AS (
  SELECT {g_cols}t, sum(st)::BIGINT AS starts, sum(en)::BIGINT AS ends
  FROM (
    SELECT {g_cols}s AS t, 1 AS st, 0 AS en FROM base
    UNION ALL
    SELECT {g_cols}e AS t, 0 AS st, 1 AS en FROM base
  ) GROUP BY {g_cols}t
),
during AS (
  SELECT {g_cols}t,
         sum(starts) OVER ({g_part}ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - coalesce(sum(ends) OVER ({g_part}ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS concurrent
  FROM ticks
),
peaks AS (SELECT {g_cols}max(concurrent)::BIGINT AS peak FROM during {g_group}),
n AS (SELECT {g_cols}count(*)::BIGINT AS n_intervals FROM base {g_group})
SELECT {"peaks.grp, " if group_expr else ""}peaks.peak, n.n_intervals
FROM peaks JOIN n {g_join}
"""


def interval_coverage(
    df: DataFrame,
    start_col: str,
    end_col: str,
    group_col: "str | None" = None,
) -> DataFrame:
    """Per-group covered length -> ``([group,] covered, n_intervals)``:
    the total length of the UNION of (possibly overlapping) closed
    intervals — "how much wall-clock was at least one session active" —
    without materializing the merged intervals.

    Classic running-max formulation, one window pass, no join: with
    intervals ordered by (start, end), the new ground an interval covers
    is ``max(0, end - max(start, max_prev_end))`` where ``max_prev_end``
    is the running max of ``end`` over all EARLIER intervals of the
    group.  Degenerate point intervals (start == end) add zero length —
    use :func:`peak_concurrency` for presence-at-a-tick questions.
    Inputs must be numeric/timestamp-ordered; units are whatever
    ``end - start`` yields."""
    s, e = F.col(start_col), F.col(end_col)
    base = df.where(s.isNotNull() & e.isNotNull() & (e >= s)).select(
        *([group_col] if group_col else []),
        s.alias("_s"),
        e.alias("_e"),
    )
    gcols = [group_col] if group_col else []
    w_prev = (
        Window.partitionBy(*gcols)
        .orderBy("_s", "_e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    gain = F.greatest(
        F.lit(0),
        F.col("_e")
        - F.greatest(F.col("_s"), F.coalesce(F.max("_e").over(w_prev), F.col("_s"))),
    )
    per_row = base.select(*gcols, gain.alias("_gain"))
    return per_row.groupBy(*gcols).agg(
        F.sum("_gain").alias("covered"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def interval_coverage_sql(
    intervals_sql: str, group: "str | None" = None
) -> str:
    """DuckDB oracle for :func:`interval_coverage` — ``intervals_sql``
    yields ([grp,] s, e) numeric."""
    gsel = "grp, " if group else ""
    gby = "PARTITION BY grp " if group else ""
    ggrp = "GROUP BY grp" if group else ""
    return f"""
WITH src AS ({intervals_sql}),
clean AS (
  SELECT {gsel}s AS _s, e AS _e FROM src
  WHERE s IS NOT NULL AND e IS NOT NULL AND e >= s
),
gains AS (
  SELECT {gsel}
         greatest(0, _e - greatest(_s, coalesce(
           max(_e) OVER ({gby}ORDER BY _s, _e
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           _s))) AS _gain
  FROM clean
)
SELECT {gsel}sum(_gain) AS covered, count(*)::BIGINT AS n_intervals
FROM gains {ggrp}
"""
