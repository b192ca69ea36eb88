"""Data layout for scan pruning: Z-order (Morton) clustering.

At 100 TB the cheapest query is the one that never reads the data:
parquet footers carry per-file/row-group min-max stats, and Spark prunes
row groups whose stats exclude the predicate.  Sorting by a single
column clusters that column only; interleaving the bits of several
columns (Morton order — the technique behind Delta/Iceberg ``OPTIMIZE
ZORDER BY``) clusters ALL of them at once, so range predicates on any
participating dimension skip most files.

Everything here is plain integer bit arithmetic in whole-stage codegen —
no UDFs — and deterministic, so the DuckDB oracle reproduces the keys
bit for bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _scaled(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) integer cells (clamped)."""
    if not hi > lo:
        raise ValueError(f"dimension range must have hi > lo, got [{lo}, {hi}]")
    cells = 1 << bits
    c = col.cast("double")
    raw = F.floor((c - F.lit(lo)) / F.lit(hi - lo) * cells).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(cells - 1), raw))


def zorder_key(dims: "list[tuple]", bits: int = 12) -> Column:
    """Morton key column from ``[(col, lo, hi), ...]`` dimension specs:
    each dimension is scaled to ``2^bits`` cells, then the cell indices'
    bits are interleaved (dimension 0 owns the lowest bit of each
    group).  Total key width = ``len(dims) * bits`` ≤ 62.

    Static expression of ``len(dims) * bits`` shift-mask terms — stays
    in codegen, no UDF.
    """
    if not dims:
        raise ValueError("zorder_key needs at least one dimension")
    d = len(dims)
    if d * bits > 62:
        raise ValueError(f"{d} dims x {bits} bits exceeds the 62-bit budget")
    key = F.lit(0).cast("long")
    for j, (col, lo, hi) in enumerate(dims):
        c = F.col(col) if isinstance(col, str) else col
        cell = _scaled(c, float(lo), float(hi), bits)
        for i in range(bits):
            key = key + F.shiftleft(
                F.shiftright(cell, i).bitwiseAND(F.lit(1)), d * i + j
            )
    return key


def zorder_key_sql(dims: "list[tuple]", bits: int = 12) -> str:
    """DuckDB expression computing the identical Morton key;
    ``dims`` entries are ``(sql_expr, lo, hi)``."""
    d = len(dims)
    cells = 1 << bits
    terms = []
    for j, (expr, lo, hi) in enumerate(dims):
        if not float(hi) > float(lo):
            raise ValueError(
                f"dimension range must have hi > lo, got [{lo}, {hi}]"
            )
        cell = (
            f"greatest(0, least({cells - 1}, "
            f"CAST(floor((CAST({expr} AS DOUBLE) - {float(lo)!r}) "
            f"/ {float(hi) - float(lo)!r} * {cells}) AS BIGINT)))"
        )
        for i in range(bits):
            terms.append(f"((({cell} >> {i}) & 1) << {d * i + j})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    dims: "list[tuple]",
    bits: int = 12,
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered in Morton order: range-partition
    on the z-key (contiguous key ranges per file → tight per-file min-max
    stats on every participating dimension), sort within partitions, drop
    the key.  ``n_files=None`` keeps the current parallelism."""
    keyed = df.withColumn("_zkey", zorder_key(dims, bits))
    parts = n_files or df.rdd.getNumPartitions()
    (
        keyed.repartitionByRange(parts, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def clustering_report(
    df: DataFrame,
    order_by: "list",
    stat_col: str,
    rows_per_file: int,
) -> DataFrame:
    """Zone-map effectiveness of a file layout -> one row per simulated
    file: ``(file, n, lo, hi, n_overlap)``.

    Simulates writing ``df`` sorted by ``order_by`` into files of
    ``rows_per_file`` rows and reports each file's min/max zone map on
    ``stat_col`` plus ``n_overlap``: how many files' ``[lo, hi]`` ranges
    a point/range probe landing in THIS file's range must also scan.
    ``sum(n_overlap)/n_files`` is the expected scan amplification — the
    number the z-order writer (:func:`write_zordered`) exists to drive
    toward 1, and the honest way to compare layouts BEFORE rewriting
    100 TB: run this on the natural order and on the candidate
    ``zorder_key``, diff the amplification.

    ``order_by`` must be a TOTAL order (add a unique id tiebreak) or
    file boundaries would depend on partitioning.  The ranking window
    is a global sort — exactly the cost the real writer pays, so the
    simulation is never more expensive than the write it predicts.  The
    overlap join is files x files, metadata-sized (|files| =
    ``n / rows_per_file``), and broadcast.
    """
    if rows_per_file < 1:
        raise ValueError(f"rows_per_file must be >= 1, got {rows_per_file}")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    rn = F.row_number().over(Window.orderBy(*cols))
    files = (
        df.select(F.col(stat_col).alias("_v"), rn.alias("_rn"))
        .select(
            F.floor((F.col("_rn") - 1) / rows_per_file)
            .cast("long")
            .alias("file"),
            "_v",
        )
        .groupBy("file")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_v").alias("lo"),
            F.max("_v").alias("hi"),
        )
    )
    other = files.select(
        F.col("file").alias("_f2"), F.col("lo").alias("_lo2"),
        F.col("hi").alias("_hi2"),
    )
    return (
        files.join(
            F.broadcast(other),
            (F.col("lo") <= F.col("_hi2")) & (F.col("_lo2") <= F.col("hi")),
        )
        .groupBy("file")
        .agg(
            F.first("n").alias("n"),
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
            F.count(F.lit(1)).alias("n_overlap"),
        )
    )


def clustering_report_sql(
    rel_sql: str,
    order_by_exprs: "list[str]",
    stat_expr: str,
    rows_per_file: int,
) -> str:
    """DuckDB oracle for :func:`clustering_report` (same simulated
    file assignment and overlap join)."""
    order = ", ".join(order_by_exprs)
    return f"""
WITH ranked AS (
  SELECT {stat_expr} AS v,
         ROW_NUMBER() OVER (ORDER BY {order}) AS rn
  FROM ({rel_sql})
), files AS (
  SELECT CAST(FLOOR((rn - 1) / {rows_per_file}) AS BIGINT) AS file,
         COUNT(*) AS n, MIN(v) AS lo, MAX(v) AS hi
  FROM ranked GROUP BY 1
)
SELECT a.file, a.n, a.lo, a.hi, COUNT(*) AS n_overlap
FROM files a JOIN files b ON a.lo <= b.hi AND b.lo <= a.hi
GROUP BY a.file, a.n, a.lo, a.hi
"""
