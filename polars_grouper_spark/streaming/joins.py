"""Stream-stream joins with event-time interval constraints.

The canonical Structured Streaming join shape (attribution, funnels
across streams, enrichment of one event stream by another): an inner
equi-join on a key plus a time-range predicate.  Both sides carry
watermarks, so the state store can expire buffered rows once the
watermark passes the interval bound — without the range constraint a
stream-stream join's state grows forever (Spark refuses unbounded
stream-stream inner joins without watermark + time constraint for
exactly this reason).

The transformation is identical for batch DataFrames (watermarks are
no-ops), which is how the DuckDB oracle checks it: with the full input
available, the streaming result equals the batch join.

Scale: state per side is bounded by (watermark horizon x event rate);
the join itself shuffles both sides on the key like any equi-join, and
AQE/skew handling applies on batch.  At 100 TB of events choose the
watermark as tight as late-data tolerance allows — it is THE state
knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import _watermarked


_JOIN_HOWS = {"inner", "left_outer"}


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
    prefix: "tuple[str, str]" = ("l_", "r_"),
    how: str = "inner",
) -> DataFrame:
    """Join ``right`` rows to ``left`` rows with the same ``key``
    and ``right_ts`` in ``(left_ts, left_ts + within]`` — "right event
    followed the left event within the horizon".  Column names are
    disambiguated with ``prefix``; the key keeps its name.

    On streaming inputs both sides are watermarked (required for state
    expiry); on batch inputs watermarks are skipped and the join is a
    plain equi-join + range filter.

    ``how="left_outer"`` additionally emits left rows with NO matching
    right event (unconverted clicks, abandoned carts) with nulls on the
    right side.  Streaming caveat (Spark semantics, asserted in tests):
    an unmatched left row's null emission happens only once the
    watermark PASSES its interval bound — rows still inside the
    watermark horizon when an ``availableNow`` stream ends are withheld
    (they might yet match), so the streaming tail differs from the
    batch left join until more data advances the watermark.
    """
    if how not in _JOIN_HOWS:
        raise ValueError(f"how must be one of {sorted(_JOIN_HOWS)}, got {how!r}")
    lp, rp = prefix
    if left.isStreaming:
        left = _watermarked(left, left_ts, watermark)
    if right.isStreaming:
        right = _watermarked(right, right_ts, watermark)

    l = left.select(
        F.col(key).alias(key),
        *[F.col(c).alias(f"{lp}{c}") for c in left.columns if c != key],
    )
    r = right.select(
        F.col(key).alias(f"{rp}{key}"),
        *[F.col(c).alias(f"{rp}{c}") for c in right.columns if c != key],
    )
    lt, rt = F.col(f"{lp}{left_ts}"), F.col(f"{rp}{right_ts}")
    cond = (
        (F.col(key) == F.col(f"{rp}{key}"))
        & (rt > lt)
        & (rt <= lt + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how).drop(f"{rp}{key}")
