"""Streaming/windowed operators over event streams.

The reference is batch-only (SURVEY.md §2: no streaming surface), so these
are part of the beyond-reference pipeline surface.  Every function accepts
both a batch DataFrame and a streaming DataFrame (``readStream``) — the
transformations are identical; watermarks only apply on streams.

Scale notes: windowed aggregations are state-store backed on streams —
the watermark bounds state size; without it a 100 TB stream accumulates
state forever.  ``dropDuplicates`` with watermark is the streaming dedup
primitive (state = keys within the watermark horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _watermarked(df: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """Apply a watermark, coercing TIMESTAMP_NTZ event time to TIMESTAMP.

    ``withWatermark`` requires TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    otherwise), but parquet written with naive timestamps decodes as
    TIMESTAMP_NTZ.  The session timezone is pinned to UTC
    (session.py), so the cast is instant-preserving and deterministic.
    """
    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, watermark)


def windowed_event_stats(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Tumbling/sliding window stats per key → (window_start, window_end,
    key, n_events, sum_value, n_users)."""
    if df.isStreaming and watermark:
        df = _watermarked(df, ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    return (
        df.groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(key_col),
            "n_events",
            "sum_value",
            "n_users",
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Session windows per key (gap-based) → (key, session_start,
    session_end, n_events, sum_value)."""
    if df.isStreaming and watermark:
        df = _watermarked(df, ts_col, watermark)
    sw = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(sw.alias("s"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col(key_col),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key dedup within the watermark horizon.

    On a stream this keeps per-key state bounded by the watermark; on a
    batch frame it degenerates to dropDuplicates.
    """
    if df.isStreaming:
        return _watermarked(df, ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
    return df.dropDuplicates(key_cols)


def windowed_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Per-(window, key) counts — the state-store-shaped half of a
    streaming top-k (state: one counter per live (window, key), bounded
    by the watermark horizon).  Ranking is NOT expressible inside a
    streaming aggregation (no rank-over-window on update streams), so
    top-k composes as this aggregation -> sink -> :func:`topk_per_window`
    over the (tiny) sink table — the continuous-aggregate cascade, where
    the expensive data-sized work happens in the stream and the rank
    runs over rows(windows)·rows(keys) metadata."""
    if df.isStreaming and watermark:
        df = _watermarked(df, ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration)
    return (
        df.groupBy(win.alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col).alias("key"),
            "n",
        )
    )


def topk_per_window(counts: DataFrame, k: int = 3) -> DataFrame:
    """Deterministic top-k per window over a (window_start, key, n)
    counts table: rank by (n desc, key asc) — total order, so ties break
    identically on any engine."""
    from pyspark.sql import Window as W

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = W.partitionBy("window_start").orderBy(F.col("n").desc(), F.col("key"))
    return (
        counts.select("*", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
    )
