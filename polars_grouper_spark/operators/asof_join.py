"""As-of (point-in-time) join — beyond-reference training-pipeline operator.

Not present in the reference (``/root/reference`` has no join operators of
its own — SURVEY.md §2 preamble); added per the build brief's
training-data-pipeline extensions.  Matches each left row to the most
recent right row at-or-before it (``direction="backward"``), or the
earliest at-or-after it (``"forward"``), per key.

Spark-first design — the **union + window** formulation, not a per-key
collect or a non-equi join:

- Tag right rows ``side=0`` and left rows ``side=1``, union them, and run
  ONE window per key ordered by ``(on, side)`` taking
  ``last(<right col>, ignorenulls=True)``.  Equal timestamps order the
  right row first, so the match is inclusive (``right.on <= left.on``),
  matching DuckDB/pandas ``merge_asof`` backward semantics.
- Cost: a single shuffle on ``by`` (the window partition key) over
  ``|L|+|R|`` rows.  A naive non-equi join is O(|L|·|R|) per key and
  Spark would plan it as a broadcast-nested-loop; the union+window plan
  scales to arbitrarily many rows per key and AQE can split skewed keys.
- ``tolerance`` bounds the match age; misses become nulls (``how="left"``)
  or drop the row (``how="inner"``).

Ties inside the right table at the same ``(by, on)`` are broken by the
window's order within equal keys, which Spark does not define — pre-dedup
the right side per ``(by, on)`` (one aggregation) if exact tie behavior
matters; the shipped queries do.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    how: str = "left",
    suffix: str = "_right",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Point-in-time join of ``right`` onto ``left``.

    Parameters
    ----------
    on: ordering column present in both frames (timestamp or numeric).
    by: equality key column(s); the shuffle/partition key.  ``None`` means
        a single global ordering (one partition — fine for dimension-sized
        inputs, not for 100 TB; always pass ``by`` at scale).
    direction: ``"backward"`` (latest right.on <= left.on),
        ``"forward"`` (earliest right.on >= left.on), or ``"nearest"``
        (whichever of the two is closer; ties prefer backward, the
        pandas ``merge_asof`` convention).  Nearest runs both window
        passes over ONE shuffle (same partition key, two in-partition
        sort orders).
    tolerance: max allowed ``abs(left.on - right.on)`` as a Column-
        compatible literal (e.g. ``F.expr("INTERVAL 1 HOUR")`` for
        timestamps, or a number for numeric ``on``).
    how: ``"left"`` keeps unmatched left rows with nulls; ``"inner"``
        drops them.
    suffix: appended to right-side payload column names that collide with
        left-side names.  The matched right ``on`` value is always emitted
        as ``f"{on}{suffix}"``.
    allow_exact_matches: ``False`` makes the comparison strict
        (``right.on < left.on`` backward / ``>`` forward), the pandas
        ``merge_asof`` knob.  Implemented purely by flipping which side
        sorts first at equal ``on`` — the window frame then excludes the
        equal-timestamp right row.  No extra shuffle or pass.

    >>> trades = spark.createDataFrame(
    ...     [("A", 4, 100.0), ("A", 7, 101.0)], ["sym", "t", "px"])
    >>> quotes = spark.createDataFrame(
    ...     [("A", 1, 99.5), ("A", 5, 100.5), ("A", 8, 101.5)],
    ...     ["sym", "t", "bid"])
    >>> asof_join(trades, quotes, on="t", by="sym").orderBy("t").show()
    +---+---+-----+-----+-------+
    |sym|  t|   px|  bid|t_right|
    +---+---+-----+-----+-------+
    |  A|  4|100.0| 99.5|      1|
    |  A|  7|101.0|100.5|      5|
    +---+---+-----+-----+-------+
    <BLANKLINE>
    >>> asof_join(trades, quotes, on="t", by="sym",
    ...           direction="nearest").orderBy("t").show()
    +---+---+-----+-----+-------+
    |sym|  t|   px|  bid|t_right|
    +---+---+-----+-----+-------+
    |  A|  4|100.0|100.5|      5|
    |  A|  7|101.0|101.5|      8|
    +---+---+-----+-----+-------+
    <BLANKLINE>
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    by_cols = [by] if isinstance(by, str) else list(by or [])

    payload = [c for c in right.columns if c not in (*by_cols, on)]
    out_names = {c: (c + suffix if c in left.columns else c) for c in payload}
    matched_on = on + suffix

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias("__r_" + c) for c in payload],
        F.lit(None).cast(right.schema[on].dataType).alias("__r_on"),
    )
    r_tag = right.select(
        *[F.col(c) for c in by_cols],
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias("__r_" + c) for c in payload],
        F.col(on).alias("__r_on"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (*by_cols, on)
        ],
    ).select(*l_tag.columns)  # align column order for the union

    def _w(order):
        return (
            Window.partitionBy(*by_cols)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    # At equal `on`, the right row (side 0) sorting BEFORE the left row
    # puts it inside the left row's preceding..current frame — inclusive
    # match.  Sorting it AFTER excludes it — strict match.
    side_order = F.col("__side").asc() if allow_exact_matches else F.col("__side").desc()
    back_order = [F.col(on).asc(), side_order]
    fwd_order = [F.col(on).desc(), side_order]
    unioned = l_tag.unionByName(r_tag)

    if direction != "nearest":
        w = _w(back_order if direction == "backward" else fwd_order)
        carried = unioned.select(
            *left.columns,
            "__side",
            *[F.last("__r_" + c, ignorenulls=True).over(w).alias("__m_" + c) for c in payload],
            F.last("__r_on", ignorenulls=True).over(w).alias("__m_on"),
        ).where(F.col("__side") == 1)

        if tolerance is not None:
            gap = (
                F.col(on) - F.col("__m_on")
                if direction == "backward"
                else F.col("__m_on") - F.col(on)
            )
            in_tol = F.col("__m_on").isNotNull() & (gap <= tolerance)
        else:
            in_tol = F.col("__m_on").isNotNull()

        carried = carried.select(
            *left.columns,
            *[
                F.when(in_tol, F.col("__m_" + c)).alias(out_names[c])
                for c in payload
            ],
            F.when(in_tol, F.col("__m_on")).alias(matched_on),
        )
    else:
        wb, wf = _w(back_order), _w(fwd_order)
        carried = unioned.select(
            *left.columns,
            "__side",
            *[F.last("__r_" + c, ignorenulls=True).over(wb).alias("__mb_" + c) for c in payload],
            F.last("__r_on", ignorenulls=True).over(wb).alias("__mb_on"),
            *[F.last("__r_" + c, ignorenulls=True).over(wf).alias("__mf_" + c) for c in payload],
            F.last("__r_on", ignorenulls=True).over(wf).alias("__mf_on"),
        ).where(F.col("__side") == 1)

        gap_b = F.col(on) - F.col("__mb_on")
        gap_f = F.col("__mf_on") - F.col(on)
        valid_b = F.col("__mb_on").isNotNull()
        valid_f = F.col("__mf_on").isNotNull()
        if tolerance is not None:
            valid_b = valid_b & (gap_b <= tolerance)
            valid_f = valid_f & (gap_f <= tolerance)
        # ties (equal gap) prefer backward — merge_asof's convention
        use_b = valid_b & (~valid_f | (gap_b <= gap_f))

        def pick(b, f, name):
            return (
                F.when(use_b, F.col(b)).when(valid_f, F.col(f)).alias(name)
            )

        carried = carried.select(
            *left.columns,
            *[pick("__mb_" + c, "__mf_" + c, out_names[c]) for c in payload],
            pick("__mb_on", "__mf_on", matched_on),
        )

    if how == "inner":
        carried = carried.where(F.col(matched_on).isNotNull())
    return carried
