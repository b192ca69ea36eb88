"""Session-timezone-independent epoch extraction for TIMESTAMP_NTZ.

The testdata's ``ts`` columns decode as TIMESTAMP_NTZ (naive wall-clock,
no zone).  Two common Spark idioms silently re-introduce the session
timezone and make query OUTPUT depend on ``spark.sql.session.timeZone``:

- ``unix_micros(ntz.cast("timestamp"))`` — the NTZ→LTZ cast interprets
  the wall clock in the SESSION zone, shifting the epoch by the zone
  offset;
- ``date_trunc(unit, ntz)`` — returns LTZ via the same conversion.

DuckDB's ``epoch_us(TIMESTAMP)`` interprets naive timestamps as UTC, so
any absolute epoch that reaches query output through the idioms above is
a latent oracle mismatch on a non-UTC cluster (found by the round-6
hostile-session sweep: 10 of 304 queries).

The portable primitive: **``unix_timestamp(ntz)`` treats the naive value
as UTC regardless of session zone** (verified on Spark 4.1.2 under UTC
and America/New_York — both yield the DuckDB epoch).  Sub-second
precision comes from ``unix_micros(cast)``'s fraction, which is safe
because every real zone offset is a whole number of minutes — the
microsecond remainder mod 1s never shifts.

Differences of epochs (durations, gaps) cancel the shift and do NOT need
this helper; only ABSOLUTE epochs that surface in output do.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _ntz(col: "Column | str") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ntz")


def epoch_s_ntz(col: "Column | str") -> Column:
    """Epoch seconds of a naive timestamp interpreted as UTC —
    session-timezone-independent (truncates the fractional second,
    matching DuckDB ``FLOOR(epoch(ts))`` for positive epochs)."""
    return F.unix_timestamp(_ntz(col))


def epoch_us_ntz(col: "Column | str") -> Column:
    """Epoch microseconds of a naive timestamp interpreted as UTC —
    session-timezone-independent, equal to DuckDB ``epoch_us(ts)``."""
    c = _ntz(col)
    return (
        F.unix_timestamp(c) * F.lit(1_000_000)
        + F.pmod(F.unix_micros(c.cast("timestamp")), F.lit(1_000_000))
    ).cast("long")


def trunc_epoch_s_ntz(col: "Column | str", step_s: int) -> Column:
    """Epoch seconds floored to a ``step_s`` grid, timezone-independent —
    the portable replacement for ``unix_timestamp(date_trunc(...))``."""
    return (F.floor(epoch_s_ntz(col) / F.lit(step_s)) * F.lit(step_s)).cast(
        "long"
    )


def date_trunc_ntz(unit: str, col: "Column | str") -> Column:
    """Calendar truncation that STAYS in the naive domain.

    ``F.date_trunc(unit, ntz)`` returns TIMESTAMP_LTZ by interpreting the
    wall clock in the session zone — the truncated instant (and any epoch
    derived from it) then depends on ``spark.sql.session.timeZone``.
    This variant truncates via field extraction + ``make_timestamp_ntz``
    (both zone-free on NTZ), returning TIMESTAMP_NTZ whose wall clock is
    truncated identically under every session zone — and identical to
    DuckDB's ``date_trunc`` on naive timestamps."""
    c = _ntz(col)
    y, mo, d = F.year(c), F.month(c), F.dayofmonth(c)
    one = F.lit(1)
    zero = F.lit(0)
    if unit == "minute":
        return F.make_timestamp_ntz(y, mo, d, F.hour(c), F.minute(c), zero)
    if unit == "hour":
        return F.make_timestamp_ntz(y, mo, d, F.hour(c), zero, zero)
    if unit == "day":
        return F.make_timestamp_ntz(y, mo, d, zero, zero, zero)
    if unit == "week":
        # ISO Monday start: weekday() is 0 for Monday — pure date math.
        monday = F.date_sub(F.to_date(c), F.weekday(F.to_date(c)))
        return F.make_timestamp_ntz(
            F.year(monday), F.month(monday), F.dayofmonth(monday),
            zero, zero, zero,
        )
    if unit == "month":
        return F.make_timestamp_ntz(y, mo, one, zero, zero, zero)
    if unit == "quarter":
        qm = (F.floor((mo - 1) / 3) * 3 + 1).cast("int")
        return F.make_timestamp_ntz(y, qm, one, zero, zero, zero)
    if unit == "year":
        return F.make_timestamp_ntz(y, one, one, zero, zero, zero)
    raise ValueError(f"unsupported trunc unit: {unit!r}")
