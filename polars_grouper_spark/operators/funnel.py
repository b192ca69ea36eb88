"""Funnel and cohort-retention analysis over event streams.

Product-analytics operators a training-data / telemetry pipeline runs at
corpus scale (the same shapes ClickHouse exposes as ``windowFunnel`` and
``retention``), expressed as pure DataFrame algebra:

- :func:`funnel_counts` — how many users completed step 1, steps 1-2,
  steps 1-2-3, ... **in timestamp order**.  ONE shuffle: events filtered
  to the step types, collected per user as a sorted (ts, type) array,
  then greedy-scanned with the ``aggregate`` higher-order function —
  depth counting never leaves whole-stage codegen, and the per-user
  array holds only that user's step-typed events.
- :func:`cohort_retention` — bucket users by first-seen period, count
  how many were active k periods later.  Two aggregations and one join
  on the user key.

Scale: both operators aggregate before they join (map-side combinable
min/count on the user key), so shuffle volume is bounded by
|users per step|, not |events|.  Period arithmetic stays in whole-stage
codegen (integer epoch math, no UDFs).

Timestamps are compared strictly (``>``): a step only counts if it
happened strictly after the previous step's earliest completion.  This
is the earliest-completion greedy matching; for steps at identical
timestamps the later funnel stage is NOT credited (deterministic and
engine-portable — no tie-break ambiguity).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_grouper_spark.plans.parallelism import local_result


def funnel_depths(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user greedy funnel depth -> ``(u, depth int)`` for every user
    with at least one step-typed event (depth 0 = none of step 1 yet).
    The scan itself runs inside codegen via the ``aggregate`` HOF over
    the user's time-sorted step events."""
    if not steps:
        raise ValueError("funnel requires at least one step")
    n_steps = len(steps)
    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("et"),
    ).where(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isin(list(steps))
    )
    per_user = ev.groupBy("u").agg(
        F.sort_array(F.collect_list(F.struct("ts", "et"))).alias("evs")
    )
    steps_arr = F.array(*[F.lit(s) for s in steps])
    acc0 = F.struct(
        F.lit(0).cast("int").alias("depth"),
        F.lit(None).cast("timestamp").alias("t"),
    )

    def advance(acc, e):
        credit = (
            (acc["depth"] < F.lit(n_steps))
            & (e["et"] == F.element_at(steps_arr, acc["depth"] + 1))
            & (acc["t"].isNull() | (e["ts"] > acc["t"]))
        )
        return F.when(
            credit,
            F.struct(
                (acc["depth"] + 1).cast("int").alias("depth"),
                e["ts"].alias("t"),
            ),
        ).otherwise(acc)

    return per_user.select(
        "u", F.aggregate("evs", acc0, advance)["depth"].alias("depth")
    )


def funnel_counts(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel completion counts -> ``(step_index, step, n_users)``
    with ``step_index`` starting at 1; every requested step appears, 0
    when no user reached it.

    A user completes step ``i`` if some step-``i`` event happens strictly
    after their earliest completion of step ``i-1`` (greedy
    earliest-completion matching — the standard funnel semantics).  The
    time-ordered scan computes exactly that: at depth ``i-1`` the first
    qualifying step-``i`` event in the sorted stream IS the earliest one,
    and because credits are strictly increasing in time, same-timestamp
    tie order within the sort never changes the result.
    """
    if not steps:
        raise ValueError("funnel_counts requires at least one step")
    depth_hist = {
        int(r["d"]): int(r["n"])
        for r in funnel_depths(df, steps, user_col, ts_col, type_col)
        .groupBy(F.col("depth").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_steps = len(steps)
    # n_users(step i) = users whose greedy depth reached at least i.
    counts = []
    for i in range(n_steps, 0, -1):
        prev = counts[-1][2] if counts else 0
        counts.append((i, steps[i - 1], prev + depth_hist.get(i, 0)))
    return local_result(
        df.sparkSession,
        list(reversed(counts)),
        "step_index int, step string, n_users long",
    )


def funnel_counts_sql(
    steps: Sequence[str],
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB oracle replicating :func:`funnel_counts`."""
    ctes = []
    for i, step in enumerate(steps):
        if i == 0:
            ctes.append(
                f"s0 AS (SELECT {user_col} AS u, min({ts_col}) AS t "
                f"FROM {table} WHERE {type_col} = '{step}' "
                f"AND {user_col} IS NOT NULL AND {ts_col} IS NOT NULL "
                f"GROUP BY 1)"
            )
        else:
            ctes.append(
                f"s{i} AS (SELECT e.{user_col} AS u, min(e.{ts_col}) AS t "
                f"FROM {table} e JOIN s{i - 1} p ON e.{user_col} = p.u "
                f"AND e.{ts_col} > p.t WHERE e.{type_col} = '{step}' "
                f"GROUP BY 1)"
            )
    selects = " UNION ALL ".join(
        f"SELECT {i + 1} AS step_index, '{s}' AS step, "
        f"(SELECT count(*) FROM s{i})::BIGINT AS n_users"
        for i, s in enumerate(steps)
    )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT step_index::INT AS step_index, step, n_users FROM ({selects})"
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention -> ``(cohort, offset, n_users)``: users bucketed
    by first-activity period (epoch-based integer), counted once per
    later period they were active in; ``offset`` is periods since the
    cohort period (0 = the cohort itself, so offset 0 counts the cohort
    size).  ``period``: ``"day"`` or ``"week"`` (fixed-width epoch
    buckets — no calendar dependence, identical in every engine).
    """
    secs = {"day": 86400, "week": 604800}
    if period not in secs:
        raise ValueError(f"period must be one of {sorted(secs)}, got {period!r}")
    w = secs[period]
    ev = df.select(
        F.col(user_col).alias("u"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / w).cast("long").alias("p"),
    ).where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())

    first = ev.groupBy("u").agg(F.min("p").alias("cohort"))
    active = ev.distinct()
    joined = active.join(first, "u").select(
        "cohort", (F.col("p") - F.col("cohort")).alias("offset")
    )
    if max_offset is not None:
        joined = joined.where(F.col("offset") <= max_offset)
    return joined.groupBy("cohort", "offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


def cohort_retention_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_offset: int | None = None,
) -> str:
    """DuckDB oracle replicating :func:`cohort_retention`."""
    secs = {"day": 86400, "week": 604800}
    w = secs[period]
    cap = "" if max_offset is None else f"WHERE p - cohort <= {int(max_offset)}"
    return f"""
WITH ev AS (
  SELECT {user_col} AS u,
         CAST(floor(epoch({ts_col}) / {w}) AS BIGINT) AS p
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
),
first AS (SELECT u, min(p) AS cohort FROM ev GROUP BY u),
active AS (SELECT DISTINCT u, p FROM ev)
SELECT cohort, p - cohort AS offset, count(*)::BIGINT AS n_users
FROM active JOIN first USING (u)
{cap}
GROUP BY 1, 2
"""


def cohort_ltv(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    amount_col: str,
    *,
    period_days: int = 28,
    max_offset: int = 12,
) -> DataFrame:
    """Cohort lifetime-value curve -> ``(cohort, age, n_cohort, revenue,
    cum_ltv)``: customers bucketed by first-purchase period (fixed-width
    epoch buckets — engine-portable arithmetic, no calendar functions),
    per-(cohort, age) revenue in exact decimals, and the running
    cumulative LTV per customer of the cohort — the payback-curve
    readout behind every acquisition-spend decision.

    Two map-side-combinable aggregations (first period per key,
    revenue per cohort x age) + one key join; the cumulative window
    runs over <= max_offset rows per cohort.  cum_ltv divides an exact
    decimal running sum by the exact cohort size."""
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1, got {period_days}")
    if max_offset < 0:
        raise ValueError(f"max_offset must be >= 0, got {max_offset}")
    secs = period_days * 86400
    src = df.where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(amount_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / secs).alias("p"),
        F.col(amount_col).cast("decimal(18,4)").alias("amt"),
    )
    first = src.groupBy("key").agg(F.min("p").alias("cohort"))
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    j = src.join(first, "key").withColumn(
        "age", (F.col("p") - F.col("cohort")).cast("int")
    ).where(F.col("age") <= max_offset)
    rev = j.groupBy("cohort", "age").agg(F.sum("amt").alias("_rev"))
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = rev.join(sizes, "cohort").select(
        "cohort",
        "age",
        "n_cohort",
        F.col("_rev").cast("double").alias("revenue"),
        (
            F.sum("_rev").over(w).cast("double")
            / F.col("n_cohort").cast("double")
        ).alias("cum_ltv"),
    )
    return out


def cohort_ltv_sql(
    src_sql: str, *, period_days: int = 28, max_offset: int = 12
) -> str:
    """DuckDB oracle for :func:`cohort_ltv` — ``src_sql`` yields
    (key, ts, amount)."""
    secs = period_days * 86400
    return f"""
WITH src AS (
  SELECT key, CAST(floor(epoch(ts) / {secs}) AS BIGINT) AS p,
         CAST(amount AS DECIMAL(18,4)) AS amt
  FROM ({src_sql})
  WHERE key IS NOT NULL AND ts IS NOT NULL AND amount IS NOT NULL
),
first AS (SELECT key, min(p) AS cohort FROM src GROUP BY key),
sizes AS (SELECT cohort, count(*) AS n_cohort FROM first GROUP BY cohort),
j AS (
  SELECT s.cohort AS cohort, CAST(src.p - s.cohort AS INT) AS age, src.amt
  FROM src JOIN first s USING (key)
  WHERE src.p - s.cohort <= {max_offset}
),
rev AS (SELECT cohort, age, sum(amt) AS rev FROM j GROUP BY 1, 2)
SELECT rev.cohort, rev.age, sizes.n_cohort,
       CAST(rev.rev AS DOUBLE) AS revenue,
       CAST(sum(rev.rev) OVER (PARTITION BY rev.cohort ORDER BY rev.age
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       / CAST(sizes.n_cohort AS DOUBLE) AS cum_ltv
FROM rev JOIN sizes USING (cohort)
"""
