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

from pyspark.sql import Column, DataFrame
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
