"""Scale-adaptive fan-out for compute-dense stages (guide §2).

Two small-data regimes leave heavy per-row compute (md5 shingle hashing,
per-character regex tokenization, candidate explosion) running on a
handful of cores:

1. **Scan stages**: a parquet scan's parallelism is bounded by its row
   groups.  A small table written as one file with one row group is ONE
   task no matter how the splits are configured — and Spark pipelines
   every narrow operation before the first exchange into that task, so
   tokenize→hash→explode chains run single-threaded.
2. **Post-shuffle stages**: AQE coalesces shuffle reads by BYTES
   (``coalescePartitions.minPartitionSize``), but a stage whose
   downstream work multiplies rows (bucket joins, perm explosion) and
   hashes each one is compute-bound per byte — a 1 MB partition can
   carry seconds of work.

``fan_out`` fixes both *conditionally*: it repartitions only when the
frame's current partitioning is below the session's configured
parallelism.  At cluster scale a 100 TB scan is thousands of splits and
the call is a no-op (no exchange added) — this is "derive parallelism
from the input" rather than a constant tuned for either local mode or
the cluster.

Only apply it where downstream results are ORDER-FREE (aggregations,
joins, hashes).  Operators whose output depends on first-appearance row
order (``monotonically_increasing_id`` interning in connected
components / association rules) must never fan out before the order is
captured.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def session_parallelism(spark) -> int:
    """The session's configured compute width: max of the shuffle width
    and the scheduler's default parallelism (covers both a cluster that
    sizes ``spark.sql.shuffle.partitions`` in the thousands and a local
    session whose shuffle width is tuned below the core count)."""
    try:
        shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except (TypeError, ValueError):
        shuffle = 200
    return max(shuffle, spark.sparkContext.defaultParallelism)


def local_result(spark, rows, schema: str, rows_per_slice: int = 100_000):
    """Driver-local rows -> DataFrame with size-appropriate slicing.

    ``spark.createDataFrame(list, schema)`` parallelizes into
    ``defaultParallelism`` slices regardless of size, so a k-row
    local-tier result (k in the tens..thousands) pays one Python-worker
    round-trip per EMPTY slice on every subsequent action — measured
    0.3-0.5 s per query at 32 cores for single-digit-row results.  One
    slice per ``rows_per_slice`` rows (min 1, capped at the session's
    parallelism) keeps small results at one task while a guard-sized
    (~2M row) tier result still fans out.
    """
    rows = [tuple(_native(v) for v in r) for r in rows]
    n_slices = max(1, -(-len(rows) // rows_per_slice))
    n_slices = min(n_slices, max(1, spark.sparkContext.defaultParallelism))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), schema
    )


def _native(v):
    """numpy scalar -> Python native.  The createDataFrame(list) path
    converts on the driver, but the RDD path ships pickled rows to the
    JVM unpickler, which rejects numpy dtypes — normalize up front so
    local-tier kernels may return numpy values either way."""
    if v is None or type(v) in (bool, int, float, str, bytes):
        return v
    if isinstance(v, (list, tuple)):
        return [_native(x) for x in v]
    if hasattr(v, "item"):  # numpy scalars incl. np.str_/np.bool_
        return v.item()
    return v


def fan_out_shared(df: DataFrame) -> DataFrame:
    """:func:`fan_out` for a frame consumed by MORE THAN ONE downstream
    pass: when the repartition actually happened (small-scan regime), the
    result is localCheckpointed so each consumer reads the materialized
    blocks instead of re-running the exchange — a keyless repartition
    sorts its input per retry-determinism (SPARK-23207), so N consumers
    would otherwise pay N scans + N sorts (measured: conformal_lineitem
    2.6 -> 8-9 s with a bare shared fan_out).  At cluster scale this is
    an identity, exactly like fan_out."""
    out = fan_out(df)
    if out is not df:
        from .iteration import truncate_lineage

        out = truncate_lineage(out)
    return out


def fan_out(df: DataFrame, *cols: str) -> DataFrame:
    """Redistribute ``df`` to the session's parallelism when its current
    plan yields fewer partitions; no-op otherwise.

    With ``cols``, hash-partitions on those columns (letting a following
    groupBy/join on the same keys reuse the exchange); without, round-
    robin.

    Self-guarding: ``.rdd.getNumPartitions()`` on an AQE plan containing
    exchanges EXECUTES those stages (measured: 2 jobs for a probe on a
    join frame), so frames whose analyzed plan is not narrow-from-scan
    are returned unchanged — they already have a shuffle that sets their
    parallelism, which is exactly the case fan_out does not need to fix.
    """
    spark = df.sparkSession
    target = session_parallelism(spark)
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
        if any(
            k in plan
            for k in ("Join", "Aggregate", "Window", "Deduplicate", "Sort", "Repartition")
        ):
            return df
        cur = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 - defensive: never fail the plan
        return df
    if cur >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)
