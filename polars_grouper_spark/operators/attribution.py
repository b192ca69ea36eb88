"""Multi-touch attribution: split conversion credit across touchpoints.

Last-touch attribution (the as-of join / ``stream_attrib``) credits one
touchpoint per conversion; LINEAR multi-touch splits each conversion's
value equally across EVERY qualifying touch in the lookback window —
the standard correction when journeys have many touches and last-touch
over-credits the final click.  Position-based schemes (U-shaped,
time-decay) are weight functions over the same joined pair set, so
this operator exposes the pair set and the linear weights; alternative
weights are one expression swap.

Plan shape: conversions ⋈ touches on the USER key (the equality key
bounds the blowup — pairs are per-user journeys, never cross-user),
time-range filter inside the join, per-conversion touch count via one
aggregation, credit = value / n.  Two shuffles (user join, conversion
count) regardless of data size.  Skewed power users are ordinary
AQE-skew-join territory; a journey cap (``max_touches``) bounds the
worst case and is the documented production knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def linear_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    *,
    window_seconds: int = 7 * 86400,
    decimals: int = 6,
) -> DataFrame:
    """Credit each conversion's value equally across that user's
    touches in ``(conversion_ts - window, conversion_ts)`` (strictly
    before the conversion) -> ``(conv_id, touch_id, n_touches, credit)``
    rows; conversions with zero qualifying touches are ABSENT (no rows
    to credit — count them upstream if unattributed value matters).

    ``ts_col`` must be integer-comparable (epoch seconds/micros — pass
    the same unit as ``window_seconds``).  Null users/timestamps drop.
    """
    if window_seconds < 1:
        raise ValueError(f"window_seconds must be >= 1, got {window_seconds}")
    c = conversions.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_cts"),
        F.col(id_col).alias("conv_id"),
        F.col(value_col).cast("double").alias("_val"),
    )
    t = touches.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_tts"),
        F.col(id_col).alias("touch_id"),
    )
    from ..plans.iteration import truncate_lineage

    # The joined pair set feeds both the per-conversion count and the
    # credit rows — materialize once instead of running the user join
    # twice (and re-scanning both inputs).
    pairs = truncate_lineage(
        c.join(t, "_u").where(
            (F.col("_tts") < F.col("_cts"))
            & (F.col("_tts") >= F.col("_cts") - F.lit(window_seconds))
        )
    )
    counts = pairs.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_touches"))
    return (
        pairs.join(counts, "conv_id")
        .select(
            "conv_id",
            "touch_id",
            "n_touches",
            F.round(F.col("_val") / F.col("n_touches"), decimals).alias("credit"),
        )
    )


def linear_attribution_sql(
    conversions_sql: str,
    touches_sql: str,
    *,
    window_seconds: int = 7 * 86400,
    decimals: int = 6,
) -> str:
    """DuckDB oracle for :func:`linear_attribution` —
    ``conversions_sql`` yields (u, ts, conv_id, val); ``touches_sql``
    yields (u, ts, touch_id)."""
    return f"""
WITH c AS (
  SELECT u, ts AS cts, conv_id, CAST(val AS DOUBLE) AS val
  FROM ({conversions_sql}) WHERE u IS NOT NULL AND ts IS NOT NULL
),
t AS (
  SELECT u, ts AS tts, touch_id
  FROM ({touches_sql}) WHERE u IS NOT NULL AND ts IS NOT NULL
),
pairs AS (
  SELECT c.conv_id, t.touch_id, c.val
  FROM c JOIN t ON t.u = c.u
   AND t.tts < c.cts AND t.tts >= c.cts - {window_seconds}
),
counts AS (SELECT conv_id, count(*)::BIGINT AS n_touches FROM pairs GROUP BY 1)
SELECT p.conv_id, p.touch_id, n.n_touches,
       round(p.val / n.n_touches, {decimals}) AS credit
FROM pairs p JOIN counts n USING (conv_id)
"""
