"""Time-ordered file replay: drive a streaming query with a REALISTIC
watermark against historical data.

The other streaming entries replay one parquet file in a single
microbatch, which forces a demo watermark spanning the whole dataset —
correct, but it never exercises the state-EXPIRY path the watermark
exists for.  This module splits a batch DataFrame into time-disjoint
chunk files written in ascending event-time order (the file source picks
files oldest-modification-time first, so sequential writes make replay
order == event-time order) and replays them one file per microbatch.
Between microbatches the watermark advances and the state store evicts
everything past the horizon, so state is bounded by
(chunk span + watermark + join interval) x event rate — NOT by history
length.  That is the production contract: at 100 TB of events the
watermark is THE state knob, and this replay shape is how you prove a
pipeline's state stays flat before pointing it at a real feed.

Equality with the batch oracle holds because chunks are time-disjoint
and ascending: a row arriving in microbatch N+1 is never older than
batch N's maximum, so nothing is late and eviction only removes rows
that can no longer satisfy the join interval.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_grouper_spark.plans.parallelism import local_result


def write_time_ordered_chunks(
    df: DataFrame,
    ts_col: str,
    out_dir: str,
    n_chunks: int = 12,
) -> int:
    """Split ``df`` into ``n_chunks`` equal-width event-time ranges and
    write them as single-file parquet chunks in ascending time order
    (file modification time — the file source's processing order —
    matches event time).  Returns the number of non-empty chunks written.

    One Spark job writes every chunk (round-8; previously min/max +
    distinct + one sequential ``coalesce(1)`` write per chunk — 2 + N
    jobs over a cached pass): the frame is hash-repartitioned on the
    chunk id and written ``partitionBy("_chunk")``, which yields exactly
    one parquet file per non-empty chunk (each chunk's rows live in one
    task), then the driver renames the partition directories to the
    ``c0000..`` layout and stamps strictly ascending mtimes so the file
    source's oldest-first order equals event-time order regardless of
    write scheduling."""
    import os
    import time

    lohi = df.agg(
        F.min(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("lo"),
        F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("hi"),
    ).collect()[0]
    if lohi["lo"] is None:
        return 0
    lo, hi = int(lohi["lo"]), int(lohi["hi"])
    span = max(hi - lo + 1, 1)
    # Drop null-timestamp rows on the timestamp itself: F.least SKIPS
    # nulls, so `_chunk` is never null (a null ts would otherwise land
    # silently in the LAST chunk with a null event time).
    bucketed = (
        df.where(F.unix_micros(F.col(ts_col).cast("timestamp")).isNotNull())
        .withColumn(
            "_chunk",
            F.least(
                F.floor(
                    (F.unix_micros(F.col(ts_col).cast("timestamp")) - F.lit(lo))
                    * F.lit(n_chunks)
                    / F.lit(span)
                ),
                F.lit(n_chunks - 1),
            ).cast("int"),
        )
    )
    stage = os.path.join(out_dir, "_stage")
    (
        bucketed.repartition(n_chunks, "_chunk")
        .write.mode("overwrite")
        .partitionBy("_chunk")
        .parquet(stage)
    )
    present = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(stage)
        if d.startswith("_chunk=")
    )
    # Re-running into a previously used out_dir must keep the old
    # per-chunk overwrite semantics: os.rename onto an existing
    # non-empty directory raises, so clear stale c* dirs first.
    for d in os.listdir(out_dir):
        if d.startswith("c") and d[1:].isdigit():
            shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
    base = time.time()
    for j, i in enumerate(present):
        chunk_dir = os.path.join(out_dir, f"c{j:04d}")
        os.rename(os.path.join(stage, f"_chunk={i}"), chunk_dir)
        for f in os.listdir(chunk_dir):
            if f.endswith(".parquet"):
                os.utime(
                    os.path.join(chunk_dir, f), (base + j, base + j)
                )
    shutil.rmtree(stage, ignore_errors=True)
    return len(present)


def replay_attribution(
    spark: SparkSession,
    events: DataFrame,
    *,
    within: str = "30 minutes",
    watermark: str = "1 hour",
    n_chunks: int = 12,
    tmp_dir: str | None = None,
    sink_name: str = "stream_attrib_bounded_sink",
) -> "tuple[DataFrame, list[dict]]":
    """Purchases attributed to the same user's views within ``within``,
    replayed time-ordered with a REALISTIC ``watermark`` (vs the
    history-spanning demo watermark of the single-batch entries).

    Returns ``(result, state_rows)`` where ``state_rows`` is the join
    state-store row count after each microbatch — callers assert it
    stays bounded by the chunk horizon instead of growing with history
    (``tests/test_streaming.py``).
    """
    import json
    import tempfile

    from .joins import interval_join

    out = tmp_dir or tempfile.mkdtemp(prefix="pgs_replay_")
    try:
        slim = events.where(
            F.col("event_type").isin("view", "purchase")
        ).select("user_id", "event_id", "event_type", "ts")
        n = write_time_ordered_chunks(slim, "ts", out, n_chunks)
        if n == 0:
            empty = local_result(
                spark, [], "user_id long, view_id long, purchase_id long, lag_secs long"
            )
            return empty, []
        schema = spark.read.parquet(f"{out}/c0000").schema

        def src():
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .option("pathGlobFilter", "*.parquet")
                .parquet(f"{out}/c*")
            )

        views = src().where(F.col("event_type") == "view")
        purchases = src().where(F.col("event_type") == "purchase")
        joined = interval_join(
            views, purchases, within=within, watermark=watermark
        ).select(
            "user_id",
            F.col("l_event_id").alias("view_id"),
            F.col("r_event_id").alias("purchase_id"),
            F.floor(
                (
                    F.unix_micros(F.col("r_ts").cast("timestamp"))
                    - F.unix_micros(F.col("l_ts").cast("timestamp"))
                )
                / 1_000_000
            ).alias("lag_secs"),
        )
        # State-store instances (and per-microbatch store init/commit cost)
        # scale with shuffle partitions; the per-batch state here is a few
        # thousand rows, so 4 stores beat the session's 32 by a wide margin.
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (
                joined.writeStream.format("memory")
                .queryName(sink_name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            state_rows = []
            for p in q.recentProgress:
                prog = p if isinstance(p, dict) else json.loads(p.json)
                for op in prog.get("stateOperators", []):
                    state_rows.append(int(op.get("numRowsTotal", 0)))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        return spark.table(sink_name), state_rows
    finally:
        if tmp_dir is None:
            shutil.rmtree(out, ignore_errors=True)
