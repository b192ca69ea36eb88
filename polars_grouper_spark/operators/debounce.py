"""Greedy per-key event debounce (rate limiting / deduplication by
minimum spacing).

"Keep an event only if at least ``gap`` has passed since the LAST KEPT
event of the same key" — alert throttling, duplicate-click suppression,
sensor downsampling.  This is NOT gap-sessionization-keep-first:
session splits compare each event to its predecessor *event*, debounce
compares to the predecessor *kept* event.  Events at t=0,3,6 with
gap=5: sessionization (gaps 3,3 both < 5) keeps only t=0; greedy
debounce keeps t=0 AND t=6.

The recurrence ``kept(i) = ts(i) >= last_kept_before(i) + gap`` depends
on its own output — inherently sequential per key, not expressible with
lag/window built-ins.  This is exactly the case the repo reserves for
an Arrow kernel: ``applyInPandas`` per key, a tight numpy scan over the
key's (sorted) timestamps, output row-identical on any partitioning.
Per-key data must fit a worker (same contract as every per-key
``applyInPandas``); keys are independent, so 100 TB of events over many
users parallelizes on the key shuffle, and a single pathological key is
the documented bound.

Total order within a key is (ts, id) — ties on ts keep the smallest id
and drop the rest of the tie group (they are within any positive gap of
the kept one).  The DuckDB oracle replays the same greedy chain with a
recursive CTE (next kept = argmin (ts, id) with ts >= last + gap).

Reference surface: none (beyond-reference operator, SURVEY.md §2
extension list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_us_ntz


def debounce(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    *,
    gap_seconds: int,
) -> DataFrame:
    """Kept events -> ``(key, id, ts_us)`` (event-time microseconds).
    Null key/ts/id rows drop; ``gap_seconds`` must be positive."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be > 0, got {gap_seconds}")
    gap_us = int(gap_seconds) * 1_000_000
    slim = df.where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(
        F.col(key_col).cast("string").alias("key"),
        F.col(id_col).cast("long").alias("id"),
        # session-TZ-independent epoch: ts_us reaches the OUTPUT, so the
        # naive timestamp must read as UTC under any session zone
        # (functions.timeutil; round-6 hostile-session sweep finding)
        epoch_us_ntz(F.col(ts_col)).alias("ts_us"),
    )

    def scan(pdf):
        pdf = pdf.sort_values(["ts_us", "id"], kind="mergesort")
        ts = pdf["ts_us"].to_numpy()
        keep = []
        last = None
        for i, t in enumerate(ts):
            if last is None or t >= last + gap_us:
                keep.append(i)
                last = t
        return pdf.iloc[keep]

    return slim.groupBy("key").applyInPandas(
        scan, "key string, id long, ts_us long"
    )


def debounce_sql(
    events_sql: str, *, gap_seconds: int
) -> str:
    """DuckDB oracle replaying :func:`debounce`'s greedy chain with a
    recursive CTE.  ``events_sql`` yields (key, id, ts_us)."""
    gap_us = int(gap_seconds) * 1_000_000
    return f"""
WITH RECURSIVE src AS ({events_sql}),
clean AS (
  SELECT CAST(key AS VARCHAR) AS key, CAST(id AS BIGINT) AS id,
         CAST(ts_us AS BIGINT) AS ts_us
  FROM src WHERE key IS NOT NULL AND id IS NOT NULL AND ts_us IS NOT NULL
),
kept(key, id, ts_us) AS (
  SELECT key, id, ts_us FROM (
    SELECT key, id, ts_us,
           row_number() OVER (PARTITION BY key ORDER BY ts_us, id) AS rn
    FROM clean
  ) WHERE rn = 1
  UNION ALL
  SELECT s.key, s.id, s.ts_us
  FROM kept k JOIN clean s
    ON s.key = k.key AND s.ts_us >= k.ts_us + {gap_us}
  WHERE NOT EXISTS (
    SELECT 1 FROM clean s2
    WHERE s2.key = k.key AND s2.ts_us >= k.ts_us + {gap_us}
      AND (s2.ts_us, s2.id) < (s.ts_us, s.id)
  )
)
SELECT key, id, ts_us FROM kept
"""
