"""CUSUM change-point detection per key (Page 1954).

The streaming-quality classic: detect when a metric's level SHIFTS
(latency regression, fraud burst, sensor drift) rather than when a
single point is extreme (that's ``functions.outliers``).  Two one-sided
cumulative sums per key over time-ordered values:

    S+ = max(0, S+ + (x - target - slack))     alarm when S+ > h, reset
    S- = max(0, S- + (target - slack - x))     alarm when S- > h, reset

The recurrence depends on its own output (resets), so — like
``operators.debounce`` — it is genuinely sequential per key and runs as
an Arrow ``applyInPandas`` scan (keys independent, partitioning
invariant).  All state is INTEGER (caller-quantized values, integer
target/slack/h), so the chain is bit-identical across engines and the
DuckDB oracle replays it with a row-by-row recursive CTE.

Scale: one shuffle on the key; per-key volume is the bound (the same
contract as every per-key kernel).  At 100 TB of events over many keys
the scan parallelizes on the key shuffle; a single pathological key is
the documented watch-point.

Reference surface: none (beyond-reference operator, SURVEY.md §2
extension list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_s_ntz, epoch_us_ntz


def cusum_alarms(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    target: int,
    slack: int,
    threshold: int,
) -> DataFrame:
    """Alarm rows -> ``(key, ts_us, value_q, direction)`` ('up' level
    shift or 'down'), one row per alarm, accumulators reset after each
    alarm.  ``value_col`` must be integer-quantized; ties in event time
    order by (ts, value) — a total order within realistic data.  Null
    key/ts/value rows drop."""
    if threshold <= 0 or slack < 0:
        raise ValueError("need threshold > 0 and slack >= 0")
    slim = df.where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).cast("string").alias("key"),
        # session-TZ-independent epoch (alarm ts_us reaches the output)
        epoch_us_ntz(F.col(ts_col)).alias("ts_us"),
        F.col(value_col).cast("long").alias("value_q"),
    )

    def scan(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["ts_us", "value_q"], kind="mergesort")
        sp = sn = 0
        out_ts, out_v, out_d = [], [], []
        for t, x in zip(pdf["ts_us"].to_numpy(), pdf["value_q"].to_numpy()):
            sp = max(0, sp + (int(x) - target - slack))
            sn = max(0, sn + (target - slack - int(x)))
            if sp > threshold:
                out_ts.append(int(t)); out_v.append(int(x)); out_d.append("up")
                sp = 0
            if sn > threshold:
                out_ts.append(int(t)); out_v.append(int(x)); out_d.append("down")
                sn = 0
        key = pdf["key"].iloc[0] if len(pdf) else None
        return pd.DataFrame(
            {"key": [key] * len(out_ts), "ts_us": out_ts,
             "value_q": out_v, "direction": out_d}
        )

    return slim.groupBy("key").applyInPandas(
        scan, "key string, ts_us long, value_q long, direction string"
    )


def cusum_alarms_sql(
    events_sql: str,
    *,
    target: int,
    slack: int,
    threshold: int,
) -> str:
    """DuckDB oracle replaying the CUSUM chain row by row with a
    recursive CTE.  ``events_sql`` yields (key, ts_us, value_q)."""
    k_up = target + slack
    k_dn = target - slack
    return f"""
WITH RECURSIVE src AS ({events_sql}),
clean AS (
  SELECT CAST(key AS VARCHAR) AS key, CAST(ts_us AS BIGINT) AS ts_us,
         CAST(value_q AS BIGINT) AS value_q,
         row_number() OVER (PARTITION BY key ORDER BY ts_us, value_q) AS rn
  FROM src WHERE key IS NOT NULL AND ts_us IS NOT NULL AND value_q IS NOT NULL
),
chain(key, rn, sp, sn, ts_us, value_q, alarm_up, alarm_dn) AS (
  SELECT key, 0, 0::BIGINT, 0::BIGINT, NULL::BIGINT, NULL::BIGINT, false, false
  FROM (SELECT DISTINCT key FROM clean)
  UNION ALL
  SELECT c.key, c.rn,
         CASE WHEN greatest(0, h.sp + (c.value_q - {k_up})) > {threshold}
              THEN 0 ELSE greatest(0, h.sp + (c.value_q - {k_up})) END,
         CASE WHEN greatest(0, h.sn + ({k_dn} - c.value_q)) > {threshold}
              THEN 0 ELSE greatest(0, h.sn + ({k_dn} - c.value_q)) END,
         c.ts_us, c.value_q,
         greatest(0, h.sp + (c.value_q - {k_up})) > {threshold},
         greatest(0, h.sn + ({k_dn} - c.value_q)) > {threshold}
  FROM chain h JOIN clean c ON c.key = h.key AND c.rn = h.rn + 1
)
SELECT key, ts_us, value_q, 'up' AS direction FROM chain WHERE alarm_up
UNION ALL
SELECT key, ts_us, value_q, 'down' FROM chain WHERE alarm_dn
"""


def burst_runs(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    step_s: int = 3600,
    factor: float = 2.0,
) -> DataFrame:
    """Burst detection per key -> one row per maximal run of consecutive
    hot buckets: ``(key, start_bucket, end_bucket, n_buckets, peak,
    total)``.  A bucket is hot when its event count exceeds ``factor``
    x the key's (lower) median bucket count — the rate-anomaly
    companion to the CUSUM mean-shift detector above: CUSUM finds level
    changes, this finds spikes and how long they lasted.

    Exactness: bucket counts are integers, the lower median is an exact
    rank pick (``2 * rank >= n``), and the run grouping is the
    gaps-and-islands constant ``bucket - row_number`` over hot buckets
    only.  The median is over OBSERVED buckets (a key silent for a year
    doesn't drag its own median to zero — absence is
    :func:`..functions.timeseries.gaps_report`'s job).

    Scale: one groupBy to buckets (map-side combinable), windows over
    the bucket table (already |keys| x |buckets|, not |rows|).
    """
    if step_s < 1:
        raise ValueError(f"step_s must be >= 1, got {step_s}")
    buckets = (
        df.select(
            F.col(key_col).alias("key"),
            # epoch_s_ntz, not unix_timestamp(cast): bucket ids surface
            # in the output and must not ride the session timezone
            F.floor(epoch_s_ntz(F.col(ts_col)) / step_s).alias("b"),
        )
        .groupBy("key", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wk = Window.partitionBy("key")
    w_rank = Window.partitionBy("key").orderBy("c")
    ranked = buckets.select(
        "key",
        "b",
        "c",
        F.row_number().over(w_rank).alias("_r"),
        F.count(F.lit(1)).over(wk).alias("_n"),
    )
    med = (
        ranked.where(2 * F.col("_r") >= F.col("_n"))
        .groupBy("key")
        .agg(F.min("c").alias("_med"))
    )
    hot = (
        buckets.join(med, "key")
        .where(F.col("c") > F.lit(float(factor)) * F.col("_med"))
    )
    w_run = Window.partitionBy("key").orderBy("b")
    runs = hot.select(
        "key",
        "b",
        "c",
        (F.col("b") - F.row_number().over(w_run)).alias("_run"),
    )
    return runs.groupBy("key", "_run").agg(
        F.min("b").alias("start_bucket"),
        F.max("b").alias("end_bucket"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("c").alias("peak"),
        F.sum("c").alias("total"),
    ).drop("_run")


def burst_runs_sql(
    rel_sql: str,
    key_expr: str,
    ts_expr: str,
    *,
    step_s: int = 3600,
    factor: float = 2.0,
) -> str:
    """DuckDB oracle for :func:`burst_runs` (same median pick and
    islands constant)."""
    return f"""
WITH buckets AS (
  SELECT {key_expr} AS key,
         CAST(FLOOR(CAST(FLOOR(epoch(CAST({ts_expr} AS TIMESTAMP)))
              AS BIGINT) / CAST({step_s} AS DOUBLE)) AS BIGINT) AS b,
         COUNT(*) AS c
  FROM ({rel_sql}) GROUP BY 1, 2
), ranked AS (
  SELECT key, b, c,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY c) AS r,
         COUNT(*) OVER (PARTITION BY key) AS n
  FROM buckets
), med AS (
  SELECT key, MIN(c) AS med FROM ranked WHERE 2 * r >= n GROUP BY key
), hot AS (
  SELECT bu.key, bu.b, bu.c
  FROM buckets bu JOIN med ON med.key = bu.key
  WHERE bu.c > {float(factor)!r} * med.med
), runs AS (
  SELECT key, b, c,
         b - ROW_NUMBER() OVER (PARTITION BY key ORDER BY b) AS run
  FROM hot
)
SELECT key, MIN(b) AS start_bucket, MAX(b) AS end_bucket,
       COUNT(*) AS n_buckets, MAX(c) AS peak, CAST(SUM(c) AS BIGINT) AS total
FROM runs GROUP BY key, run
"""


def best_mean_split(df: DataFrame, t_col: str, x_col: str) -> DataFrame:
    """Binary-segmentation step -> ONE row ``(split_t, n_before,
    n_after, mean_before, mean_after, gain)``: the single split point
    that maximizes the between-segment variance of an integer-valued
    series — the greedy changepoint primitive (apply recursively per
    segment for multiple breaks; CUSUM alarms stream, this one
    LOCATES).

    gain(k) = S₁²/n₁ + S₂²/n₂ − S²/n over the prefix/suffix split at
    time k.  Prefix sums come from the bucketed exclusive-prefix
    carry-in (no data-sized single-partition window); every arithmetic
    input is an exact integer, so the float gains are identical in both
    engines and the argmax (gain desc, then earliest t) cannot drift.
    Split semantics: ``split_t`` is the LAST tick of the left segment;
    needs >= 2 ticks, else empty."""
    from ..functions.experiment import _exclusive_prefix

    src = df.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(x_col).cast("long").alias("x"),
    ).where(F.col("t").isNotNull() & F.col("x").isNotNull())
    cum = _exclusive_prefix(src, "t", ["x"])
    # inclusive prefix counts need a row index too: reuse the helper by
    # summing a ones column.
    cum = _exclusive_prefix(
        cum.withColumn("_one", F.lit(1)), "t", ["_one"]
    )
    tot = src.agg(
        F.count(F.lit(1)).alias("n_i"),
        F.sum("x").cast("double").alias("s"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    n1 = (F.col("_pre__one") + F.lit(1)).cast("double")
    s1 = (F.col("_pre_x") + F.col("x")).cast("double")
    n = F.col("n_i").cast("double")
    n2 = n - n1
    s2 = F.col("s") - s1
    gain = (
        s1 * s1 / n1 + s2 * s2 / n2 - F.col("s") * F.col("s") / n
    )
    cand = j.where(n2 > 0).withColumn("_g", gain)
    return (
        cand.orderBy(F.col("_g").desc(), "t")
        .limit(1)
        .select(
            F.col("t").alias("split_t"),
            n1.cast("long").alias("n_before"),
            n2.cast("long").alias("n_after"),
            (s1 / n1).alias("mean_before"),
            (s2 / n2).alias("mean_after"),
            F.col("_g").alias("gain"),
        )
    )


def best_mean_split_sql(series_sql: str) -> str:
    """DuckDB oracle for :func:`best_mean_split` — ``series_sql``
    yields (t, x)."""
    return f"""
WITH src AS (
  SELECT CAST(t AS BIGINT) AS t, CAST(x AS BIGINT) AS x
  FROM ({series_sql}) WHERE t IS NOT NULL AND x IS NOT NULL
),
cum AS (
  SELECT t, x,
         sum(x) OVER (ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1_i,
         count(*) OVER (ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n1_i
  FROM src
),
tot AS (SELECT count(*) AS n_i, CAST(sum(x) AS DOUBLE) AS s FROM src),
cand AS (
  SELECT t,
         CAST(n1_i AS DOUBLE) AS n1, CAST(s1_i AS DOUBLE) AS s1,
         CAST(n_i AS DOUBLE) - CAST(n1_i AS DOUBLE) AS n2,
         s - CAST(s1_i AS DOUBLE) AS s2,
         n_i, s
  FROM cum CROSS JOIN tot
  WHERE CAST(n_i AS DOUBLE) - CAST(n1_i AS DOUBLE) > 0
)
SELECT t AS split_t,
       CAST(n1 AS BIGINT) AS n_before, CAST(n2 AS BIGINT) AS n_after,
       s1 / n1 AS mean_before, s2 / n2 AS mean_after,
       s1 * s1 / n1 + s2 * s2 / n2 - s * s / CAST(n_i AS DOUBLE) AS gain
FROM cand
ORDER BY gain DESC, t
LIMIT 1
"""
