"""Bloom-style semi-join reduction: prune the fact side BEFORE the join
shuffle.

The big-join problem at 100 TB: ``fact JOIN dim`` where ``dim`` was
filtered down to a sliver (one nation's suppliers, one day's campaign)
still shuffles EVERY fact row to the join — the filter's selectivity is
discovered only after the exchange.  Engines fix this with runtime
filters (Spark's ``spark.sql.optimizer.runtimeFilter.*``, DPP on
partition columns); this module is the same idea as an explicit,
planner-independent operator built from this engine's own sketch
toolkit, so it works on any join key (not just partition columns) and
its false-positive budget is caller-visible.

Shape: the dim side's join keys reduce to a ``bloom_bits`` row-set —
at most ``2^m_bits`` ``(pos)`` rows, FIXED state regardless of dim size
— which broadcast-left-semi-joins against the fact's hashed key
positions.  Fact rows whose key cannot be in dim (any of the k bit
positions unset) drop at scan speed, before the exchange; survivors
(true matches + the classic ``(1-e^{-kn/m})^k`` false-positive rate)
proceed to the real join, which re-checks exactly.  The result is
provably identical to the plain join — the oracle runs the plain join.

The broadcast is the filter's bit-set rows, bounded by ``min(k·|dim|,
2^m_bits)`` — tune ``m_bits`` to the dim's distinct-key count (~10 bits
of filter per key for ~1% FP).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..functions.sketches import bloom_bits
from .parallelism import fan_out


def bloom_filtered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    *,
    m_bits: int = 18,
    k: int = 4,
    how: str = "inner",
    portable: bool = True,
) -> DataFrame:
    """``fact ⋈ dim`` with a Bloom pre-filter on the fact side ->
    exactly the rows of the plain join (the Bloom pass never drops a
    true match; its false positives are eliminated by the join itself).

    ``how`` must be a join type that cannot RESURRECT pruned fact rows
    — ``inner``/``left_semi`` (and ``right`` outer on the dim side);
    a left/full outer over the fact side would need the pruned rows
    back and is rejected."""
    if how not in ("inner", "left_semi", "right"):
        raise ValueError(
            f"how={how!r} would need the Bloom-pruned fact rows back; "
            "use inner/left_semi/right"
        )
    m = 1 << m_bits
    bits = bloom_bits(dim, dim_key, m_bits=m_bits, k=k, portable=portable)
    # Fact side: k positions per key; a row survives iff ALL k are set.
    # Expressed as k successive broadcast LEFT SEMI joins folded into a
    # conjunction via groupBy-count == k over (row-key, position) --
    # cheaper: join on ANY position match would admit rows with one hit,
    # so instead probe each position independently and AND them: the
    # first unset position kills the row.  With k small this is k
    # broadcast hash semi-joins, each at scan speed, zero shuffles.
    # The k probes cost k portable hashes per fact row BEFORE the first
    # exchange, so a single-row-group scan would run them one-threaded;
    # fan_out redistributes only when the scan is narrower than the
    # session width (no-op on a many-split 100 TB scan), and the join
    # result is order-free by contract.
    out = fan_out(fact)
    for i in range(k):
        h = portable_hash64(
            F.concat(F.lit(str(i) + "|"), F.col(fact_key).cast("string")),
            portable=portable,
        )
        probe = out.withColumn("_pos", F.pmod(h, F.lit(m)).cast("int"))
        out = probe.join(
            F.broadcast(bits.withColumnRenamed("pos", "_pos")),
            "_pos",
            "left_semi",
        ).drop("_pos")
    return out.join(dim, out[fact_key] == dim[dim_key], how)
