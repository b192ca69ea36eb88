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
