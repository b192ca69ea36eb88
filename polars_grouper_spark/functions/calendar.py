"""Calendar dimension generation — the warehouse date spine.

Every reporting stack joins facts to a date dimension (day-of-week,
month boundaries, fiscal periods).  Generating it IN the engine (range
-> date arithmetic) beats shipping a CSV: it is reproducible, spans any
horizon, and costs one `spark.range` over epoch days — no data scan at
all.

Cross-engine determinism notes: day-of-week numbering differs between
engines (Spark's dayofweek is 1=Sunday; DuckDB's dayofweek is
0=Sunday), so ``dow`` here is pure integer epoch arithmetic —
``(epoch_day + 3) % 7`` giving 0=Monday..6=Sunday (1970-01-01 was a
Thursday = 3) — identical everywhere.  Month/quarter/year use each
engine's calendar functions, which agree on the Gregorian calendar.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def calendar_dim(
    spark: SparkSession,
    start: str,
    end: str,
    *,
    fiscal_start_month: int = 2,
) -> DataFrame:
    """Date spine for ``[start, end]`` inclusive (ISO date strings) ->
    ``(date, epoch_day, dow, day, month, quarter, year, is_month_start,
    is_month_end, fiscal_year, fiscal_quarter)``.

    ``fiscal_start_month``: first month of the fiscal year (default
    February); fiscal year/quarter derive from integer month
    arithmetic, not engine-specific fiscal functions."""
    if not 1 <= fiscal_start_month <= 12:
        raise ValueError(
            f"fiscal_start_month must be in [1, 12], got {fiscal_start_month}"
        )
    d0 = _dt.date.fromisoformat(start)
    d1 = _dt.date.fromisoformat(end)
    if d1 < d0:
        raise ValueError(f"end {end} precedes start {start}")
    lo = (d0 - _dt.date(1970, 1, 1)).days
    hi = (d1 - _dt.date(1970, 1, 1)).days
    days = spark.range(lo, hi + 1).select(F.col("id").alias("epoch_day"))
    dt = F.date_add(F.lit("1970-01-01").cast("date"), F.col("epoch_day").cast("int"))
    m = F.month(dt)
    fiscal_shift = (m - F.lit(fiscal_start_month) + F.lit(12)) % F.lit(12)
    return days.select(
        dt.cast("string").alias("date"),
        "epoch_day",
        ((F.col("epoch_day") + F.lit(3)) % F.lit(7)).cast("int").alias("dow"),
        F.dayofmonth(dt).cast("int").alias("day"),
        m.cast("int").alias("month"),
        F.quarter(dt).cast("int").alias("quarter"),
        F.year(dt).cast("int").alias("year"),
        (F.dayofmonth(dt) == 1).alias("is_month_start"),
        (F.month(F.date_add(dt, 1)) != m).alias("is_month_end"),
        F.when(
            m >= fiscal_start_month, F.year(dt) + 1
        ).otherwise(F.year(dt)).cast("int").alias("fiscal_year"),
        ((fiscal_shift / F.lit(3)).cast("int") + F.lit(1)).alias(
            "fiscal_quarter"
        ),
    )


def calendar_dim_sql(
    start: str, end: str, *, fiscal_start_month: int = 2
) -> str:
    """DuckDB oracle for :func:`calendar_dim`."""
    d0 = _dt.date.fromisoformat(start)
    d1 = _dt.date.fromisoformat(end)
    lo = (d0 - _dt.date(1970, 1, 1)).days
    hi = (d1 - _dt.date(1970, 1, 1)).days
    f = fiscal_start_month
    return f"""
WITH days AS (
  SELECT CAST(u.d AS BIGINT) AS epoch_day,
         DATE '1970-01-01' + CAST(u.d AS INT) AS dt
  FROM unnest(range({lo}, {hi} + 1)) AS u(d)
)
SELECT CAST(dt AS VARCHAR) AS date, epoch_day,
       CAST((epoch_day + 3) % 7 AS INT) AS dow,
       CAST(day(dt) AS INT) AS day,
       CAST(month(dt) AS INT) AS month,
       CAST(quarter(dt) AS INT) AS quarter,
       CAST(year(dt) AS INT) AS year,
       day(dt) = 1 AS is_month_start,
       month(dt + 1) <> month(dt) AS is_month_end,
       CAST(CASE WHEN month(dt) >= {f} THEN year(dt) + 1
                 ELSE year(dt) END AS INT) AS fiscal_year,
       CAST((month(dt) - {f} + 12) % 12 // 3 AS INT) + 1 AS fiscal_quarter
FROM days
"""
