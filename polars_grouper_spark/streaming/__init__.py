"""Structured Streaming operators (batch-compatible where possible)."""

from polars_grouper_spark.streaming.rollup import time_rollup
from polars_grouper_spark.streaming.windows import (
    sessionize,
    streaming_dedup,
    windowed_event_stats,
)

__all__ = ["sessionize", "streaming_dedup", "time_rollup", "windowed_event_stats"]
