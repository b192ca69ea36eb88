"""Range (interval) join — beyond-reference training-pipeline operator.

Not present in the reference (no join operators of its own — SURVEY.md §2
preamble).  Joins a fact table to an interval table on
``lo <= value < hi`` (bound closedness configurable).

Two physical strategies, both declarative so Catalyst/AQE keep working:

- ``"broadcast"`` — ``facts ⋈ broadcast(intervals)`` on the range
  predicate.  Spark plans a *broadcast* nested-loop join: each task scans
  its fact partition once against the in-memory interval list.  Right for
  dimension-sized interval tables (tiers, SLA windows, calendars) — no
  shuffle of the fact side at all.
- ``"bucketed"`` — the scale path when the interval table is itself
  large.  Both sides are mapped to fixed-width buckets:
  facts to ``floor(value / w)``, intervals **exploded** to every bucket
  they overlap (``sequence(floor(lo/w), floor(hi/w))``).  The join becomes
  an equi-join on the bucket id (shuffle-hash/sort-merge, AQE-sizable)
  with the exact range predicate re-applied as a post-filter.  Explosion
  factor = avg interval width / w, so pick ``bucket_width`` near the
  median interval width; candidate pairs ≈ true pairs × (1 + w/width).
  This turns an O(|F|·|I|) nested loop into a partitionable equi-join —
  the difference between hours and seconds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _range_pred(value, lo, hi, closed: str):
    if closed == "left":
        return (lo <= value) & (value < hi)
    if closed == "right":
        return (lo < value) & (value <= hi)
    if closed == "both":
        return (lo <= value) & (value <= hi)
    if closed == "neither":
        return (lo < value) & (value < hi)
    raise ValueError(f"closed must be left|right|both|neither, got {closed!r}")


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
    closed: str = "left",
    strategy: str = "broadcast",
    bucket_width: float | None = None,
) -> DataFrame:
    """Join ``facts`` rows to the ``intervals`` rows containing
    ``facts[value_col]``.

    ``how``: ``"inner"`` or ``"left"`` (unmatched facts kept with nulls).
    ``strategy``: ``"broadcast"`` (small interval table) or ``"bucketed"``
    (large interval table; requires numeric ``value_col`` and
    ``bucket_width``).

    >>> orders = spark.createDataFrame(
    ...     [(1, 30.0), (2, 75.0), (3, 120.0)], ["order_id", "price"])
    >>> tiers = spark.createDataFrame(
    ...     [("low", 0.0, 50.0), ("mid", 50.0, 100.0)], ["tier", "lo", "hi"])
    >>> range_join(orders, tiers, "price", how="left").orderBy(
    ...     "order_id").select("order_id", "price", "tier").show()
    +--------+-----+----+
    |order_id|price|tier|
    +--------+-----+----+
    |       1| 30.0| low|
    |       2| 75.0| mid|
    |       3|120.0|NULL|
    +--------+-----+----+
    <BLANKLINE>
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    value = facts[value_col]
    pred = _range_pred(value, intervals[lo_col], intervals[hi_col], closed)

    if strategy == "broadcast":
        return facts.join(F.broadcast(intervals), pred, how)

    if strategy != "bucketed":
        raise ValueError(f"strategy must be broadcast|bucketed, got {strategy!r}")
    if bucket_width is None or bucket_width <= 0:
        raise ValueError("bucketed strategy requires a positive bucket_width")

    w = float(bucket_width)
    f_b = facts.withColumn("__bucket", F.floor(F.col(value_col) / w))
    i_b = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    pred_b = (
        (f_b["__bucket"] == i_b["__bucket"])
        & _range_pred(f_b[value_col], i_b[lo_col], i_b[hi_col], closed)
    )
    joined = f_b.join(i_b, pred_b, how)
    # Drop both bucket helper columns (left's stays non-null under a left
    # join; right's may be null).
    return joined.drop(f_b["__bucket"]).drop(i_b["__bucket"])
