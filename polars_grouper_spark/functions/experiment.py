"""Deterministic experiment (A/B) analysis over event logs.

The online-experimentation loop every event pipeline feeds: assign each
user to a variant with a salted hash (the same engine-portable
construction as ``functions.sampling`` — stable across runs, engines,
and re-partitioning; changing the salt re-randomizes the experiment),
reduce exposure + conversion to one row per user, then compare variant
conversion rates with the two-proportion pooled z-test.

Scale shape: assignment is row-local (scan speed); the only shuffle is
the per-user reduction (map-side combinable bool-max); the z-test runs
on per-variant aggregates — one row per variant, metadata.  At 100 TB
of events this is one scan + one user-keyed shuffle.

The statistic is closed-form arithmetic over exact integer counts, so
the oracle reproduces it bit-for-bit: z = (p_a − p_b) / sqrt(p̂(1−p̂)
(1/n_a + 1/n_b)) with p̂ the pooled rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import portable_hash64, portable_hash64_sql

_Z_CRIT = 1.959963984540054  # two-sided 95%


def assign_variant(
    user_col: Column | str,
    salt: str = "exp",
    *,
    n_variants: int = 2,
    portable: bool = True,
) -> Column:
    """Stable unit-of-randomization assignment -> variant int in
    ``[0, n_variants)``.  Hash-based, so a user keeps one variant across
    sessions, days, and re-runs — the non-negotiable property of a
    valid experiment."""
    if n_variants < 2:
        raise ValueError(f"n_variants must be >= 2, got {n_variants}")
    c = F.col(user_col) if isinstance(user_col, str) else user_col
    h = portable_hash64(
        F.concat(F.lit(salt + "|"), c.cast("string")), portable=portable
    )
    return F.pmod(h, F.lit(n_variants)).cast("int")


def ab_test(
    df: DataFrame,
    user_col: str,
    conversion_col: Column,
    salt: str = "exp",
    *,
    portable: bool = True,
    decimals: int = 6,
) -> DataFrame:
    """Two-variant conversion experiment -> ONE row ``(n_a, conv_a,
    rate_a, n_b, conv_b, rate_b, z, significant)``.

    ``conversion_col``: boolean expression over the event row (e.g.
    ``F.col("event_type") == "purchase"``); a user converts if ANY of
    their rows satisfies it.  ``significant`` is the two-sided 95%
    pooled z-test."""
    per_user = (
        df.where(F.col(user_col).isNotNull())
        .groupBy(F.col(user_col).alias("_u"))
        .agg(F.max(conversion_col.cast("int")).alias("_conv"))
        .select(
            assign_variant("_u", salt, portable=portable).alias("_v"), "_conv"
        )
    )
    per_variant = per_user.groupBy("_v").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_conv").alias("conv")
    )
    a = per_variant.where(F.col("_v") == 0).select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = per_variant.where(F.col("_v") == 1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    j = a.crossJoin(b)
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("conv_a").cast("double"), F.col("conv_b").cast("double")
    pa, pb = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    se = F.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    z = F.when(se > 0, (pa - pb) / se)
    return j.select(
        "n_a",
        "conv_a",
        F.round(pa, decimals).alias("rate_a"),
        "n_b",
        "conv_b",
        F.round(pb, decimals).alias("rate_b"),
        F.round(z, decimals).alias("z"),
        F.coalesce(F.abs(z) > _Z_CRIT, F.lit(False)).alias("significant"),
    )


def ab_test_sql(
    src_sql: str,
    user_expr: str,
    conversion_expr: str,
    salt: str = "exp",
    *,
    decimals: int = 6,
) -> str:
    """DuckDB oracle for :func:`ab_test` — same hash assignment, same
    pooled z arithmetic."""
    h = portable_hash64_sql(f"'{salt}' || '|' || CAST(u AS VARCHAR)")
    return f"""
WITH src AS ({src_sql}),
per_user AS (
  SELECT {user_expr} AS u,
         max(CASE WHEN {conversion_expr} THEN 1 ELSE 0 END) AS conv
  FROM src WHERE {user_expr} IS NOT NULL GROUP BY 1
),
assigned AS (SELECT ({h}) % 2 AS v, conv FROM per_user),
per_variant AS (
  SELECT v, count(*)::BIGINT AS n, sum(conv)::BIGINT AS conv
  FROM assigned GROUP BY v
),
j AS (
  SELECT a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b
  FROM (SELECT * FROM per_variant WHERE v = 0) a,
       (SELECT * FROM per_variant WHERE v = 1) b
)
SELECT n_a, conv_a, round(conv_a::DOUBLE / n_a, {decimals}) AS rate_a,
       n_b, conv_b, round(conv_b::DOUBLE / n_b, {decimals}) AS rate_b,
       round(CASE WHEN sqrt(((conv_a + conv_b)::DOUBLE / (n_a + n_b))
                       * (1 - (conv_a + conv_b)::DOUBLE / (n_a + n_b))
                       * (1.0 / n_a + 1.0 / n_b)) > 0
             THEN (conv_a::DOUBLE / n_a - conv_b::DOUBLE / n_b)
                  / sqrt(((conv_a + conv_b)::DOUBLE / (n_a + n_b))
                         * (1 - (conv_a + conv_b)::DOUBLE / (n_a + n_b))
                         * (1.0 / n_a + 1.0 / n_b))
             END, {decimals}) AS z,
       coalesce(abs(CASE WHEN sqrt(((conv_a + conv_b)::DOUBLE / (n_a + n_b))
                       * (1 - (conv_a + conv_b)::DOUBLE / (n_a + n_b))
                       * (1.0 / n_a + 1.0 / n_b)) > 0
             THEN (conv_a::DOUBLE / n_a - conv_b::DOUBLE / n_b)
                  / sqrt(((conv_a + conv_b)::DOUBLE / (n_a + n_b))
                         * (1 - (conv_a + conv_b)::DOUBLE / (n_a + n_b))
                         * (1.0 / n_a + 1.0 / n_b))
             END) > {_Z_CRIT!r}, FALSE) AS significant
FROM j
"""
