"""Multi-resolution time rollup — the "hypertable continuous aggregate"
pattern (beyond-reference pipeline operator; the reference has no
grouping/windowing surface of its own — SURVEY.md §2 preamble).

One call produces the same aggregate at several time resolutions
(hour/day/week/...) with a ``resolution`` discriminator column.

Spark-first design: all resolutions come out of a SINGLE aggregation
using ``GROUPING SETS`` over pre-projected ``date_trunc`` columns — one
shuffle and one pass over the input, with map-side partial aggregation,
instead of one groupBy-shuffle per resolution (the naive union-of-groupBys
plan scans and shuffles the fact table R times).  ``grouping(col)``
distinguishes which set each output row belongs to.

At 100 TB the single-pass property is the whole point: the fact-table
scan dominates, so R resolutions for the price of one.  The operator is
batch-shaped (grouping sets are not supported on streams); for streaming,
aggregate the finest resolution with ``windowed_event_stats`` and roll
coarser tiers up from its sink — the standard continuous-aggregate
cascade, whose input is the tiny finest-tier table, not the stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import date_trunc_ntz

_VALID = {"minute", "hour", "day", "week", "month", "quarter", "year"}


def time_rollup(
    df: DataFrame,
    aggs: Sequence[Column],
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    resolutions: Sequence[str] = ("hour", "day"),
) -> DataFrame:
    """Aggregate ``df`` at every resolution in one pass.

    Output: ``(resolution string, bucket_start timestamp, *key_cols,
    *aggs)`` — ``bucket_start`` is the truncated timestamp of the bucket.

    ``aggs``: aggregate Columns with aliases (e.g.
    ``F.count(F.lit(1)).alias("n")``).
    """
    bad = set(resolutions) - _VALID
    if bad:
        raise ValueError(f"unsupported resolutions: {sorted(bad)}")
    if not resolutions:
        raise ValueError("need at least one resolution")

    # date_trunc_ntz, not F.date_trunc: the built-in returns LTZ by
    # interpreting the naive wall clock in the SESSION zone, making
    # bucket_start (and epochs derived from it) timezone-dependent —
    # round-6 hostile-session sweep finding.
    trunc_cols = [
        date_trunc_ntz(r, F.col(ts_col)).alias(f"__t_{r}") for r in resolutions
    ]
    base = df.select(*df.columns, *trunc_cols)

    # GROUPING SETS: one set per resolution, all sharing key_cols — a
    # single hash aggregation (with map-side partials) over one scan.
    # grouping() flags must be computed inside the aggregation; they mark
    # which trunc column each output row was grouped by.
    flags = [
        F.grouping(f"__t_{r}").cast("int").alias(f"__g_{r}") for r in resolutions
    ]
    out = base.groupingSets(
        [[*[F.col(k) for k in key_cols], F.col(f"__t_{r}")] for r in resolutions],
        *[F.col(k) for k in key_cols],
        *[F.col(f"__t_{r}") for r in resolutions],
    ).agg(*aggs, *flags)
    n_front = len(key_cols) + len(resolutions)
    agg_names = out.columns[n_front:-len(resolutions)] if resolutions else []

    # Each output row belongs to exactly one grouping set: its resolution
    # is the one whose trunc column was grouped (grouping = 0).
    res_label = F.lit(None).cast("string")
    bucket = F.lit(None).cast("timestamp_ntz")
    for r in resolutions:
        is_this = F.col(f"__g_{r}") == 0
        res_label = F.when(is_this, F.lit(r)).otherwise(res_label)
        bucket = F.when(is_this, F.col(f"__t_{r}")).otherwise(bucket)
    return out.select(
        res_label.alias("resolution"),
        bucket.alias("bucket_start"),
        *key_cols,
        *agg_names,
    )
