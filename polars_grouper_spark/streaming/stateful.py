"""Custom stateful streaming operators via Arrow-batched state kernels.

The reference has no streaming surface; these demonstrate the
``applyInPandasWithState`` path for semantics the built-in windowed
aggregations can't express (running totals that must be emitted per
micro-batch, custom eviction policies).

Scale notes: state lives in the state store keyed by the group key —
bounded by distinct keys, not events.  Use timeouts to evict idle keys on
unbounded key spaces.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def _update_running(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def running_user_totals(df: DataFrame) -> DataFrame:
    """Running per-user event count/value-sum, emitted every micro-batch.

    On a streaming frame: ``applyInPandasWithState`` (update mode).  On a
    batch frame: degenerates to the equivalent groupBy aggregation (same
    schema), so callers can reuse one code path in tests and backfills.
    """
    if df.isStreaming:
        return (
            df.groupBy("user_id")
            .applyInPandasWithState(
                _update_running,
                outputStructType=RUNNING_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
    from pyspark.sql import functions as F

    return df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("sum_value"),
    )
