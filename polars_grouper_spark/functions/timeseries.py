"""Exponentially-weighted moving statistics over event streams.

EWMA is the constant-memory trend estimator (monitoring, rate
estimation, feature smoothing): newer points weigh geometrically more,
so the statistic adapts without storing history.  The textbook
recurrence ``ewma_i = α·ewma_{i-1} + x_i`` is a sequential scan — the
one shape distributed SQL cannot parallelize directly.  Two standard
escapes: (a) closed-form weights over a BOUNDED trailing window (this
module — the weight of a point K steps back is α^K, which underflows
to irrelevance fast, so a K-row frame loses nothing measurable for
α ≤ ~0.9 and K ≥ ~50), or (b) per-key sequential fold inside a
``transformWith``-style kernel (the streaming Welford operator's
posture).

Implementation: one window ``collect_list`` over the trailing frame
(ordered by the window's total order), then ONE left fold
``acc → acc·α + x`` — the fold of ``[x₁ … xₙ]`` yields
``Σ xⱼ·α^(n-j)`` exactly, and the normalizer ``Σ α^j`` has the closed
form ``(1-α^n)/(1-α)``.  Everything is built-in HOFs (JVM-side, no
Python); the fold order is the frame order on BOTH engines, so the
float result is reproducible bit for bit and rounds stably.

The per-key window shuffles once on the key — the same single-shuffle
posture as every other windowed feature here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .timeutil import epoch_s_ntz


def ewma(
    df: DataFrame,
    key_col: str,
    order_cols: "list[str]",
    value_col: str,
    *,
    alpha: float = 0.8,
    lookback: int = 50,
    out_col: str = "ewma",
    round_to: int = 6,
) -> DataFrame:
    """Trailing-window EWMA per key -> input rows (null-value rows
    dropped) plus ``out_col``.

    ``alpha`` is the DECAY factor applied to older points (weight of
    the point j steps back is ``alpha^j``; alpha→0 tracks the last
    point, alpha→1 approaches a plain trailing mean).  ``order_cols``
    must be a deterministic total order within each key (e.g.
    ``[ts, event_id]``).  ``lookback`` bounds the frame at K rows —
    the truncation error is at most ``alpha^K / (1-alpha)`` of one
    point's weight.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    if lookback < 1:
        raise ValueError(f"lookback must be >= 1, got {lookback}")
    v = F.col(value_col)
    base = df.where(F.col(key_col).isNotNull() & v.isNotNull())
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-(lookback - 1), 0)
    )
    vals = F.collect_list(v.cast("double")).over(w)
    num = F.aggregate(
        vals, F.lit(0.0), lambda acc, x: acc * F.lit(alpha) + x
    )
    n = F.size(vals)
    den = (F.lit(1.0) - F.pow(F.lit(alpha), n.cast("double"))) / F.lit(1.0 - alpha)
    return base.select(
        "*", F.round(num / den, round_to).alias(out_col)
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    step_s: int = 3600,
    round_to: int = 6,
) -> DataFrame:
    """Resample an irregular per-key series onto a regular ``step_s``
    grid with forward-fill -> ``(key, bucket_epoch, val)`` — one row per
    key per grid step from the key's first to last observation, carrying
    the latest observation at or before that step.

    The gap-filling shape every monitoring / feature-store pipeline
    needs, with no sequential scan: (1) observations crush to one row
    per (key, bucket) via a lexicographic struct-max — latest ``ts``
    wins, value tie-breaks, so the reduction is deterministic under ANY
    aggregation order and map-side combinable; (2) the grid is generated
    per key with ``sequence(min_bucket, max_bucket)`` — output-sized,
    never data-sized; (3) the fill is one ``last(ignoreNulls)`` running
    window per key.  Two shuffles total (bucket agg, window), both on
    the key.

    Scale note: grid rows = span/step per key — the caller's ``step_s``
    is the knob; a key observed over a year at 1 h steps emits 8 760
    rows regardless of how many billion raw observations it had.
    Dense-output explosion (tiny step × long span) is the caller's
    contract, as with any resample."""
    if step_s < 1:
        raise ValueError(f"step_s must be >= 1, got {step_s}")
    v = F.col(value_col).cast("double")
    base = df.where(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull() & v.isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_s)
        .cast("long")
        .alias("bucket"),
        F.unix_timestamp(F.col(ts_col)).alias("_ep"),
        v.alias("_v"),
    )
    obs = base.groupBy("key", "bucket").agg(
        F.max(F.struct(F.col("_ep").alias("t"), F.col("_v").alias("v")))["v"].alias(
            "_val"
        )
    )
    span = obs.groupBy("key").agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    )
    grid = span.select(
        "key", F.explode(F.sequence("_b0", "_b1")).alias("bucket")
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = grid.join(obs, ["key", "bucket"], "left").select(
        "key",
        (F.col("bucket") * step_s).alias("bucket_epoch"),
        F.round(F.last("_val", ignorenulls=True).over(w), round_to).alias("val"),
    )
    return filled


def resample_ffill_sql(
    src_sql: str,
    key_expr: str,
    ts_expr: str,
    value_expr: str,
    *,
    step_s: int = 3600,
    round_to: int = 6,
) -> str:
    """DuckDB oracle for :func:`resample_ffill`: identical bucket
    reduction (struct max), identical per-key ``generate_series`` grid,
    identical ``last_value IGNORE NULLS`` running fill."""
    return f"""
WITH src AS ({src_sql}),
base AS (
  SELECT {key_expr} AS key,
         CAST(floor(epoch({ts_expr}) / {step_s}) AS BIGINT) AS bucket,
         CAST(floor(epoch({ts_expr})) AS BIGINT) AS ep,
         CAST({value_expr} AS DOUBLE) AS v
  FROM src
  WHERE {key_expr} IS NOT NULL AND {ts_expr} IS NOT NULL
        AND {value_expr} IS NOT NULL
),
obs AS (
  SELECT key, bucket, (max({{'t': ep, 'v': v}})).v AS val
  FROM base GROUP BY key, bucket
),
span AS (
  SELECT key, min(bucket) AS b0, max(bucket) AS b1 FROM obs GROUP BY key
),
grid AS (
  SELECT key, unnest(generate_series(b0, b1)) AS bucket FROM span
)
SELECT g.key, g.bucket * {step_s} AS bucket_epoch,
       round(last_value(o.val IGNORE NULLS) OVER (
         PARTITION BY g.key ORDER BY g.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), {round_to}) AS val
FROM grid g LEFT JOIN obs o ON o.key = g.key AND o.bucket = g.bucket
"""


def ewma_sql(
    src_sql: str,
    key_expr: str,
    order_exprs: "list[str]",
    value_expr: str,
    *,
    alpha: float = 0.8,
    lookback: int = 50,
    out_col: str = "ewma",
    round_to: int = 6,
) -> str:
    """DuckDB oracle for :func:`ewma` — replays the identical fold over
    the identical frame.  ``src_sql`` yields the input columns; output
    is ``SELECT *`` of the null-filtered rows plus ``out_col``."""
    order = ", ".join(order_exprs)
    return f"""
WITH src AS ({src_sql}),
framed AS (
  SELECT *,
         list(CAST({value_expr} AS DOUBLE)) OVER w AS _vals
  FROM src
  WHERE {key_expr} IS NOT NULL AND {value_expr} IS NOT NULL
  WINDOW w AS (PARTITION BY {key_expr} ORDER BY {order}
               ROWS BETWEEN {lookback - 1} PRECEDING AND CURRENT ROW)
)
SELECT * EXCLUDE (_vals),
       round(
         list_reduce(_vals, (acc, x) -> acc * {alpha!r} + x)
         / ((1.0 - power({alpha!r}, len(_vals))) / (1.0 - {alpha!r})),
         {round_to}) AS {out_col}
FROM framed
"""


def seasonal_profile(df: DataFrame, ts_col: str, value_col: str) -> DataFrame:
    """Additive weekly/daily seasonal decomposition -> one row per
    (weekday, hour) cell: ``(dow, hour, n, cell_mean, dow_effect,
    hour_effect, residual)`` with ``dow`` 0=Monday..6=Sunday.

    ``cell_mean = overall + dow_effect + hour_effect + residual`` — the
    two-way main-effects model behind "is Tuesday 3am traffic actually
    anomalous, or just Tuesday 3am?".  Detrending by this profile is the
    standard pre-step before change-point/outlier detection on metrics
    with strong weekly shape (cf. the CUSUM operator).

    Scale + determinism: values micro-quantize once (``round(v * 1e8)``
    as long) and ONE groupBy reduces the data to at most 168 cells; the
    marginal (weekday / hour / grand) sums derive from those cell sums
    by exact integer window sums over the 168-row table — so a 100 TB
    input costs one map-side-combinable aggregation, and every mean is
    the same ``micro_sum / 1e8 / n`` double division on both engines.
    """
    vi = F.round(F.col(value_col).cast("double") * 1e8).cast("long")
    cell = (
        df.select(
            F.weekday(F.col(ts_col)).cast("long").alias("dow"),
            F.hour(F.col(ts_col)).cast("long").alias("hour"),
            vi.alias("_vi"),
        )
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_vi").alias("_s"))
    )
    w_all = Window.partitionBy()
    w_dow = Window.partitionBy("dow")
    w_hr = Window.partitionBy("hour")
    overall = F.sum("_s").over(w_all) / 1e8 / F.sum("n").over(w_all)
    dow_mean = F.sum("_s").over(w_dow) / 1e8 / F.sum("n").over(w_dow)
    hr_mean = F.sum("_s").over(w_hr) / 1e8 / F.sum("n").over(w_hr)
    cell_mean = F.col("_s") / 1e8 / F.col("n")
    return cell.select(
        "dow",
        "hour",
        "n",
        cell_mean.alias("cell_mean"),
        (dow_mean - overall).alias("dow_effect"),
        (hr_mean - overall).alias("hour_effect"),
        (cell_mean - overall - (dow_mean - overall) - (hr_mean - overall)).alias(
            "residual"
        ),
    )


def seasonal_profile_sql(rel_sql: str, ts_expr: str, value_expr: str) -> str:
    """DuckDB oracle for :func:`seasonal_profile` (same micro-sums and
    division order; ``isodow - 1`` matches Spark's ``weekday``)."""
    return f"""
WITH cell AS (
  SELECT CAST(date_part('isodow', {ts_expr}) - 1 AS BIGINT) AS dow,
         CAST(date_part('hour', {ts_expr}) AS BIGINT) AS hour,
         COUNT(*) AS n,
         SUM(CAST(ROUND(CAST({value_expr} AS DOUBLE) * 1e8) AS BIGINT)) AS s
  FROM ({rel_sql}) GROUP BY 1, 2
)
SELECT dow, hour, n,
       s / 1e8 / n AS cell_mean,
       (SUM(s) OVER (PARTITION BY dow) / 1e8
          / SUM(n) OVER (PARTITION BY dow))
         - (SUM(s) OVER () / 1e8 / SUM(n) OVER ()) AS dow_effect,
       (SUM(s) OVER (PARTITION BY hour) / 1e8
          / SUM(n) OVER (PARTITION BY hour))
         - (SUM(s) OVER () / 1e8 / SUM(n) OVER ()) AS hour_effect,
       (s / 1e8 / n)
         - (SUM(s) OVER () / 1e8 / SUM(n) OVER ())
         - ((SUM(s) OVER (PARTITION BY dow) / 1e8
               / SUM(n) OVER (PARTITION BY dow))
            - (SUM(s) OVER () / 1e8 / SUM(n) OVER ()))
         - ((SUM(s) OVER (PARTITION BY hour) / 1e8
               / SUM(n) OVER (PARTITION BY hour))
            - (SUM(s) OVER () / 1e8 / SUM(n) OVER ())) AS residual
FROM cell
"""


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Time-weighted average per key -> ``(key, n_obs, total_secs,
    twap)``: each observation holds its value until the NEXT
    observation, so the mean weighs values by holding duration — the
    correct average for irregularly-sampled state (price books, gauge
    metrics, feature stores), where the plain mean over-counts busy
    periods.  The final observation has no successor and carries zero
    weight (the standard right-open convention).

    Determinism/scale: one ``lead`` window per key (the single
    key-partitioned sort); duration is exact integer seconds, values
    micro-quantize to longs, and ``twap = micro_sum / 1e8 /
    total_secs`` is one shared division.  Keys with a single
    observation return NULL (zero holding time).

    Overflow: ``value_micro * dur_secs`` per row must fit a long —
    |value| < ~9e3 held for a year, or any value held for < ~3 years;
    rescale the quantization for wider regimes.
    """
    w = Window.partitionBy("_k").orderBy(F.col("_ts"), F.col("_vi"))
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.round(F.col(value_col).cast("double") * 1e8)
        .cast("long")
        .alias("_vi"),
    )
    timed = base.select(
        "_k",
        "_vi",
        (
            F.lead(F.unix_timestamp("_ts")).over(w)
            - F.unix_timestamp("_ts")
        ).alias("_dur"),
    )
    agg = timed.groupBy(F.col("_k").alias("key")).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.coalesce("_dur", F.lit(0))).alias("total_secs"),
        F.sum(F.col("_vi") * F.coalesce("_dur", F.lit(0))).alias("_ws"),
    )
    twap = F.when(
        F.col("total_secs") > 0,
        F.col("_ws") / 1e8 / F.col("total_secs"),
    )
    return agg.select("key", "n_obs", "total_secs", twap.alias("twap"))


def time_weighted_avg_sql(
    rel_sql: str,
    key_expr: str,
    ts_expr: str,
    value_expr: str,
) -> str:
    """DuckDB oracle for :func:`time_weighted_avg` (same lead window
    and micro-sums)."""
    return f"""
WITH base AS (
  SELECT {key_expr} AS k, CAST({ts_expr} AS TIMESTAMP) AS ts,
         CAST(ROUND(CAST({value_expr} AS DOUBLE) * 1e8) AS BIGINT) AS vi
  FROM ({rel_sql})
), timed AS (
  SELECT k, vi,
         COALESCE(
           CAST(FLOOR(epoch(LEAD(ts) OVER (PARTITION BY k ORDER BY ts, vi)))
                AS BIGINT)
             - CAST(FLOOR(epoch(ts)) AS BIGINT), 0) AS dur
  FROM base
)
SELECT k AS key, COUNT(*) AS n_obs, CAST(SUM(dur) AS BIGINT) AS total_secs,
       CASE WHEN SUM(dur) > 0
            THEN SUM(vi * dur) / 1e8 / SUM(dur) END AS twap
FROM timed GROUP BY k
"""


def gaps_report(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    step_s: int,
) -> DataFrame:
    """Missing-bucket report per key -> ``(key, first_bucket,
    last_bucket, expected, observed, missing)`` on a regular
    ``step_s``-second grid between each key's first and last
    observation.

    The liveness check a metrics/ingest pipeline runs before trusting a
    feed: :func:`resample_ffill` silently papers over holes; this
    operator counts them.  ``missing = (span / step + 1) - distinct
    observed buckets`` — two map-side-combinable aggregations, all
    integer, never materializing the expected grid (a year of hourly
    buckets is a subtraction here, not 8 760 generated rows).
    """
    if step_s < 1:
        raise ValueError(f"step_s must be >= 1, got {step_s}")
    # epoch_s_ntz: first/last_bucket surface in the output — they must
    # not ride the session timezone (round-6 hostile-session finding)
    b = F.floor(epoch_s_ntz(F.col(ts_col)) / step_s)
    per_bucket = df.select(
        F.col(key_col).alias("key"), b.alias("_b")
    ).distinct()
    return (
        per_bucket.groupBy("key")
        .agg(
            F.min("_b").alias("first_bucket"),
            F.max("_b").alias("last_bucket"),
            F.count(F.lit(1)).alias("observed"),
        )
        .select(
            "key",
            "first_bucket",
            "last_bucket",
            (F.col("last_bucket") - F.col("first_bucket") + 1).alias(
                "expected"
            ),
            "observed",
            (
                F.col("last_bucket") - F.col("first_bucket") + 1
                - F.col("observed")
            ).alias("missing"),
        )
    )


def gaps_report_sql(
    rel_sql: str,
    key_expr: str,
    ts_expr: str,
    step_s: int,
) -> str:
    """DuckDB oracle for :func:`gaps_report` (same integer buckets;
    FLOOR(epoch(..)) matches Spark's truncating unix_timestamp)."""
    return f"""
WITH per_bucket AS (
  SELECT DISTINCT {key_expr} AS key,
         CAST(FLOOR(CAST(FLOOR(epoch(CAST({ts_expr} AS TIMESTAMP)))
              AS BIGINT) / CAST({step_s} AS DOUBLE)) AS BIGINT) AS b
  FROM ({rel_sql})
)
SELECT key, MIN(b) AS first_bucket, MAX(b) AS last_bucket,
       MAX(b) - MIN(b) + 1 AS expected,
       COUNT(*) AS observed,
       MAX(b) - MIN(b) + 1 - COUNT(*) AS missing
FROM per_bucket GROUP BY key
"""


def acf(df: DataFrame, t_col: str, x_col: str, *, max_lag: int = 7) -> DataFrame:
    """Sample autocorrelation at lags ``1..max_lag`` -> ``(lag, n_pairs,
    acf)`` — the seasonality detector (a daily series with a weekly
    cycle spikes at lag 7).

    Input is a series of INTEGER values at integer ticks (counts, sums
    of quantized units): that keeps every accumulated sum exact, so the
    float formula evaluates on identical inputs in both engines —
    double summation order never enters.  The lag alignment is ONE
    equality join of the series against itself shifted by an exploded
    lag column (never a window over the unpartitioned series), so ticks
    may be sparse (missing days simply contribute no pair) and the plan
    scales with |series| x max_lag.

    acf(L) = [Σ x_t·x_{t+L} − x̄·(Σ_left + Σ_right) + m_L·x̄²]
             / [Σ x² − n·x̄²]    with x̄ the global mean, m_L the pair
    count — the standard biased estimator, denominator over the full
    series."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    src = df.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(x_col).cast("long").alias("x"),
    ).where(F.col("t").isNotNull() & F.col("x").isNotNull())
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    base = src.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
    )
    lags = src.sparkSession.range(1, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    left = src.crossJoin(F.broadcast(lags)).select(
        "lag", (F.col("t") + F.col("lag")).alias("t2"), F.col("x").alias("xl")
    )
    right = src.select(F.col("t").alias("t2"), F.col("x").alias("xr"))
    per = (
        left.join(right, "t2")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(dec(F.col("xl") * F.col("xr"))).alias("sxy"),
            F.sum(dec(F.col("xl"))).alias("sl"),
            F.sum(dec(F.col("xr"))).alias("sr"),
        )
    )
    j = per.crossJoin(F.broadcast(base))
    mean = F.col("sx").cast("double") / F.col("n")
    num = (
        F.col("sxy").cast("double")
        - mean * (F.col("sl").cast("double") + F.col("sr").cast("double"))
        + F.col("m") * mean * mean
    )
    den = F.col("sxx").cast("double") - F.col("n") * mean * mean
    return j.select(
        "lag", F.col("m").alias("n_pairs"), (num / den).alias("acf")
    ).orderBy("lag")


def acf_sql(series_sql: str, *, max_lag: int = 7) -> str:
    """DuckDB oracle for :func:`acf` — ``series_sql`` yields (t, x)."""
    return f"""
WITH src AS (
  SELECT CAST(t AS BIGINT) AS t, CAST(x AS BIGINT) AS x FROM ({series_sql})
  WHERE t IS NOT NULL AND x IS NOT NULL
),
base AS (
  SELECT count(*) AS n, sum(CAST(x AS DECIMAL(38,0))) AS sx,
         sum(CAST(x * x AS DECIMAL(38,0))) AS sxx
  FROM src
),
lags AS (SELECT CAST(u.l AS INT) AS lag FROM unnest(range(1, {max_lag} + 1)) AS u(l)),
per AS (
  SELECT l.lag, count(*) AS m,
         sum(CAST(a.x * b.x AS DECIMAL(38,0))) AS sxy,
         sum(CAST(a.x AS DECIMAL(38,0))) AS sl,
         sum(CAST(b.x AS DECIMAL(38,0))) AS sr
  FROM src a CROSS JOIN lags l JOIN src b ON b.t = a.t + l.lag
  GROUP BY l.lag
)
SELECT lag, m AS n_pairs,
       (CAST(sxy AS DOUBLE)
        - (CAST(sx AS DOUBLE) / n) * (CAST(sl AS DOUBLE) + CAST(sr AS DOUBLE))
        + m * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
       / (CAST(sxx AS DOUBLE) - n * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
         AS acf
FROM per CROSS JOIN base
ORDER BY lag
"""


def wape_backtest(
    df: DataFrame, t_col: str, x_col: str, *, lag: int = 7
) -> DataFrame:
    """Seasonal-naive forecast backtest -> ONE row ``(n_days,
    sum_abs_err, sum_actual, wape)``: forecast each tick with the value
    ``lag`` ticks earlier and score WAPE = Σ|x−f| / Σx — the
    denominator-summed form of MAPE that (a) never divides by a
    zero-volume tick and (b) is a ratio of EXACT integer sums, so no
    per-row float ratios accumulate in engine-chosen order.  The
    baseline every real forecaster must beat; one equality self-join,
    sparse ticks just drop pairs."""
    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    src = df.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(x_col).cast("long").alias("x"),
    ).where(F.col("t").isNotNull() & F.col("x").isNotNull())
    fc = src.select((F.col("t") + lag).alias("t"), F.col("x").alias("f"))
    j = src.join(fc, "t")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = j.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(dec(F.abs(F.col("x") - F.col("f")))).alias("sae_d"),
        F.sum(dec(F.col("x"))).alias("sa_d"),
    )
    return agg.select(
        "n_days",
        F.col("sae_d").cast("long").alias("sum_abs_err"),
        F.col("sa_d").cast("long").alias("sum_actual"),
        F.when(
            F.col("sa_d") > 0,
            F.col("sae_d").cast("double") / F.col("sa_d").cast("double"),
        ).alias("wape"),
    )


def wape_backtest_sql(series_sql: str, *, lag: int = 7) -> str:
    """DuckDB oracle for :func:`wape_backtest` — ``series_sql`` yields
    (t, x)."""
    return f"""
WITH src AS (
  SELECT CAST(t AS BIGINT) AS t, CAST(x AS BIGINT) AS x FROM ({series_sql})
  WHERE t IS NOT NULL AND x IS NOT NULL
),
j AS (
  SELECT a.x AS x, b.x AS f
  FROM src a JOIN src b ON a.t = b.t + {lag}
),
agg AS (
  SELECT count(*) AS n_days,
         sum(CAST(abs(x - f) AS DECIMAL(38,0))) AS sae_d,
         sum(CAST(x AS DECIMAL(38,0))) AS sa_d
  FROM j
)
SELECT n_days, CAST(sae_d AS BIGINT) AS sum_abs_err,
       CAST(sa_d AS BIGINT) AS sum_actual,
       CASE WHEN sa_d > 0
            THEN CAST(sae_d AS DOUBLE) / CAST(sa_d AS DOUBLE) END AS wape
FROM agg
"""
