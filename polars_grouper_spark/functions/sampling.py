"""Deterministic, engine-portable sampling and dataset splitting.

Training pipelines need train/val/test assignment that is (a) stable
across runs, partitionings, and engines, (b) a pure projection — no
shuffle, no RNG state — and (c) reproducible by the oracle.  Both
helpers key off the portable md5-derived hash (``functions.hashing``),
salted with a purpose string so the split hash and the sample hash are
independent: a doc landing in ``val`` says nothing about whether it is
sampled.

At 100 TB this is the right construction: assignment is row-local
(scan-speed, embarrassingly parallel), joins against the assignment are
reproducible on any engine, and changing the salt re-rolls every
decision without touching data layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import portable_hash64, portable_hash64_sql

N_BUCKETS = 10_000


def _bucket(id_col: str, salt: str, *, portable: bool = True) -> Column:
    h = portable_hash64(
        F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")), portable=portable
    )
    return F.pmod(h, F.lit(N_BUCKETS))


def _bucket_sql(id_expr: str, salt: str) -> str:
    h = portable_hash64_sql(f"'{salt}' || '|' || CAST({id_expr} AS VARCHAR)")
    return f"(({h}) % {N_BUCKETS})"


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: "dict[str, float] | None" = None,
    salt: str = "split",
    *,
    portable: bool = True,
) -> DataFrame:
    """Assign each row a split label -> ``(*df.columns, bucket, split)``.

    ``weights`` maps label -> fraction (must sum to ~1); labels are
    applied in the given order over the hash-bucket range, so the same
    (salt, weights) always yields the same assignment for a given id.
    """
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    b = F.col("bucket")
    expr, lo = None, 0.0
    labels = list(weights.items())
    for label, frac in labels[:-1]:
        hi = lo + frac
        cond = b < int(round(hi * N_BUCKETS))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
        lo = hi
    last = F.lit(labels[-1][0])
    split = last if expr is None else expr.otherwise(last)
    out = df.select("*", _bucket(id_col, salt, portable=portable).alias("bucket"))
    return out.select("*", split.alias("split"))


def deterministic_split_sql(
    id_expr: str, weights: "dict[str, float] | None" = None, salt: str = "split"
) -> "tuple[str, str]":
    """DuckDB fragments replicating :func:`deterministic_split`:
    ``(bucket_expr, split_case_expr_over_bucket_column)``."""
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    labels = list(weights.items())
    case, lo = "CASE", 0.0
    for label, frac in labels[:-1]:
        lo += frac
        case += f" WHEN bucket < {int(round(lo * N_BUCKETS))} THEN '{label}'"
    case += f" ELSE '{labels[-1][0]}' END"
    return _bucket_sql(id_expr, salt), case


def stratified_sample(
    df: DataFrame,
    fractions: "dict[str, float]",
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "sample",
    *,
    default_fraction: float = 0.0,
    portable: bool = True,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample (``sampleBy`` without the
    RNG): keep a row iff its salted hash bucket falls under its stratum's
    fraction.  Unlisted strata get ``default_fraction``.
    """
    frac = None
    for stratum, f_ in fractions.items():
        cond = F.col(strata_col) == F.lit(stratum)
        frac = F.when(cond, F.lit(f_)) if frac is None else frac.when(cond, F.lit(f_))
    frac = F.lit(default_fraction) if frac is None else frac.otherwise(F.lit(default_fraction))
    # Double comparison, NOT an int cast of frac*N: Spark's int cast
    # truncates while DuckDB's rounds, so 0.15*10000 = 1499.999... would
    # disagree.  IEEE double compare is identical in both engines.
    b = _bucket(id_col, salt, portable=portable)
    return df.where(b.cast("double") < frac * N_BUCKETS)


def stratified_sample_sql(
    fractions: "dict[str, float]",
    strata_expr: str,
    id_expr: str,
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> str:
    """DuckDB WHERE-clause fragment replicating :func:`stratified_sample`."""
    case = "CASE"
    for stratum, f_ in fractions.items():
        case += f" WHEN {strata_expr} = '{stratum}' THEN {f_!r}"
    case += f" ELSE {default_fraction!r} END"
    return f"CAST({_bucket_sql(id_expr, salt)} AS DOUBLE) < ({case}) * {N_BUCKETS}"
