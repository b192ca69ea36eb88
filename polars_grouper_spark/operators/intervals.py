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
    from ..plans.iteration import truncate_lineage

    s, e = F.col(start_col), F.col(end_col)
    # base feeds both tick unions and the interval count — materialize.
    base = truncate_lineage(df.where(s.isNotNull() & e.isNotNull() & (e >= s)))
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


def rolling_active_count(
    df: DataFrame,
    key_col: str,
    tick_col: str,
    window: int,
) -> DataFrame:
    """Trailing-window distinct-key count per tick — the DAU/WAU/MAU
    aggregation — WITHOUT a range self-join or a windowed count-distinct
    (Spark has neither at scale).

    For every tick present in the input, returns
    ``(tick, active_now, active_window)``: the number of distinct keys
    seen AT that tick, and within the trailing ``window`` ticks
    ``[tick - window + 1, tick]``.

    Sweep-line formulation: a key active at tick t is counted at output
    ticks ``[t, t + window - 1]``, so each key's activity becomes a set
    of coverage intervals; per-key runs of activity whose gaps are
    ≤ ``window`` merge into ONE interval (lag + conditional cumsum), each
    merged run emits +1 at its start and −1 past its end, and one
    cumulative sum over the tick axis yields the count.  The only
    data-sized shuffle is the initial ``(key, tick)`` distinct; the
    per-key window rides the same hash partitioning, and the final
    cumsum runs over per-tick aggregates (days, not events).  The naive
    plan — join every tick against a ``window``-wide range of events and
    count-distinct — multiplies the data ``window``-fold before a giant
    distinct; the oracle does exactly that, as the cross-check.

    ``tick_col`` must be integer-valued (day number, hour number);
    ``window`` is in ticks and must be >= 1.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    from ..plans.iteration import truncate_lineage

    k, t = F.col(key_col), F.col(tick_col)
    # The (key, tick) distinct feeds THREE consumers (run detection,
    # per-tick counts, output-tick filter); materialize it once so the
    # plan reads the source a single time instead of recomputing the
    # distinct per branch (plan-asserted in tests/test_plans.py).
    da = truncate_lineage(
        df.where(k.isNotNull() & t.isNotNull())
        .select(k.alias("key"), t.cast("long").alias("tick"))
        .distinct()
    )
    w_lag = Window.partitionBy("key").orderBy("tick")
    runs = da.select(
        "key",
        "tick",
        F.when(
            F.col("tick") - F.lag("tick").over(w_lag) <= window, F.lit(0)
        )
        .otherwise(F.lit(1))
        .alias("is_new"),
    ).select(
        "key",
        "tick",
        F.sum("is_new")
        .over(w_lag.rowsBetween(Window.unboundedPreceding, 0))
        .alias("run"),
    )
    per_run = runs.groupBy("key", "run").agg(
        F.min("tick").alias("s"),
        (F.max("tick") + F.lit(window - 1)).alias("e"),
    )
    deltas = (
        per_run.select(F.col("s").alias("tick"), F.lit(1).alias("d"))
        .unionAll(per_run.select((F.col("e") + 1).alias("tick"), F.lit(-1).alias("d")))
        .groupBy("tick")
        .agg(F.sum("d").alias("delta"))
    )
    day_counts = da.groupBy("tick").agg(F.count(F.lit(1)).alias("active_now"))
    w_cum = Window.orderBy("tick").rowsBetween(Window.unboundedPreceding, 0)
    swept = (
        deltas.join(day_counts, "tick", "full_outer")
        .select(
            "tick",
            F.coalesce("delta", F.lit(0)).alias("delta"),
            "active_now",
        )
        .select(
            "tick",
            "active_now",
            F.sum("delta").over(w_cum).cast("long").alias("active_window"),
        )
    )
    return swept.where(F.col("active_now").isNotNull()).select(
        "tick", F.col("active_now").cast("long").alias("active_now"), "active_window"
    )


def rolling_active_count_sql(
    activity_sql: str, window: int
) -> str:
    """DuckDB oracle for :func:`rolling_active_count` via the NAIVE plan
    (range join + count distinct) — deliberately a different algorithm.
    ``activity_sql`` yields ``(key, tick)`` (need not be distinct)."""
    return f"""
WITH da AS (
  SELECT DISTINCT key, CAST(tick AS BIGINT) AS tick FROM ({activity_sql})
  WHERE key IS NOT NULL AND tick IS NOT NULL
),
days AS (SELECT DISTINCT tick FROM da)
SELECT d.tick AS tick,
       count(DISTINCT CASE WHEN a.tick = d.tick THEN a.key END)::BIGINT
         AS active_now,
       count(DISTINCT a.key)::BIGINT AS active_window
FROM days d JOIN da a ON a.tick BETWEEN d.tick - {window - 1} AND d.tick
GROUP BY 1
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
SELECT {gsel}CAST(sum(_gain) AS BIGINT) AS covered,
       count(*)::BIGINT AS n_intervals
FROM gains {ggrp}
"""
