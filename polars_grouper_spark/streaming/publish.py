"""Streaming last-writer-wins publish: a serving table maintained from
a stream by idempotent per-microbatch merges.

The production pattern behind every "current state" table fed by a
firehose (latest profile per user, latest price per SKU, latest label
per document): each microbatch reduces DISTRIBUTED to one candidate row
per key, then folds into the running table with a last-writer-wins
merge.  Two properties make it exactly-once-safe without sink
transactions:

* **Idempotent**: the merge is ``max`` over the total order
  ``(ts, id)`` — re-delivering a microbatch (the at-least-once failure
  mode) changes nothing, because max is idempotent.
* **Order-free**: max is commutative/associative, so ANY batching or
  arrival order of the input yields the identical final table —
  asserted against the one-shot batch replay by the oracle.

State is keys-sized (the serving table itself), not stream-sized; the
per-batch reduction is the data-sized distributed work and only
changed-key candidates reach the fold.  Lineage over the running table
truncates per batch (the iterative-loop discipline from
``plans.iteration``).

Reference surface: none (beyond-reference streaming operator,
SURVEY.md §2 extension list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.iteration import truncate_lineage


class StreamingUpsertPublisher:
    """Running last-writer-wins table fed by a streaming query.

    Usage::

        pub = StreamingUpsertPublisher("user_id", "ts", "event_id",
                                       ["value"])
        q = (stream.writeStream.foreachBatch(pub.update)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        current = pub.table()       # one row per key, the newest record
    """

    def __init__(
        self,
        key_col: str,
        ts_col: str,
        id_col: str,
        value_cols: "list[str]",
    ):
        if not value_cols:
            raise ValueError("publisher needs at least one value column")
        self.key_col = key_col
        self.ts_col = ts_col
        self.id_col = id_col
        self.value_cols = list(value_cols)
        self.state: "DataFrame | None" = None
        self.batches = 0

    def _pick(self, df: DataFrame) -> DataFrame:
        """Reduce to one row per key: max over the (ts, id) total order
        — one map-side-combinable aggregate, the LWW kernel."""
        struct = F.struct(
            F.col("_ts").alias("ts"),
            F.col("_id").alias("id"),
            *[F.col(c).alias(c) for c in self.value_cols],
        )
        picked = df.groupBy("key").agg(F.max(struct).alias("_s"))
        return picked.select(
            "key",
            F.col("_s.ts").alias("_ts"),
            F.col("_s.id").alias("_id"),
            *[F.col(f"_s.{c}").alias(c) for c in self.value_cols],
        )

    def _normalize(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.col(self.key_col).alias("key"),
            F.col(self.ts_col).alias("_ts"),
            F.col(self.id_col).alias("_id"),
            *self.value_cols,
        )

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: reduce the microbatch per key, fold into
        the running table by the same LWW max."""
        candidate = self._pick(self._normalize(batch_df))
        if self.state is None:
            merged = candidate
        else:
            merged = self._pick(self.state.unionByName(candidate))
        self.state = truncate_lineage(merged)
        self.batches += 1

    def table(self) -> DataFrame:
        """The serving table -> ``(key, ts, id, *value_cols)``."""
        if self.state is None:
            raise ValueError("publisher has seen no batches")
        return self.state.select(
            F.col("key"),
            F.col("_ts").alias(self.ts_col),
            F.col("_id").alias(self.id_col),
            *self.value_cols,
        )


def lww_table_sql(
    rel_sql: str,
    key_expr: str,
    ts_expr: str,
    id_expr: str,
    value_exprs: "list[str]",
) -> str:
    """DuckDB oracle for the published table: the one-shot batch
    arg-max over everything the stream saw — what order-freedom and
    idempotence guarantee the streaming fold equals."""
    vals = ", ".join(f"{v}" for v in value_exprs)
    return f"""
SELECT {key_expr} AS key, {ts_expr}, {id_expr}, {vals}
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY {key_expr}
    ORDER BY {ts_expr} DESC, {id_expr} DESC) AS rn
  FROM ({rel_sql})
) WHERE rn = 1
"""
