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


def welch_ttest(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    *,
    quant: int = 1000,
) -> DataFrame:
    """Welch's unequal-variance t-test between two samples -> one row
    ``(n_a, mean_a, n_b, mean_b, t, dof)`` — the continuous-metric
    companion to the two-proportion z-test above (revenue per user,
    latency, session length).

    Exactness: values quantize to ``round(v * quant)`` longs; each side
    reduces to the exact integer moments (n, Σx, Σx²) in ONE map-side
    combinable aggregation, and every downstream mean/variance/t/dof is
    the same double expression over those integers on both engines.
    Overflow bound: ``n * (max|v| * quant)²`` must fit a long —
    |v| ≤ ~100 at quant=1000 supports ~9e8 rows per side; lower
    ``quant`` for wider value ranges.  Sides with fewer than 2 rows
    return NULL t/dof.
    """
    if quant < 1:
        raise ValueError(f"quant must be >= 1, got {quant}")

    def moments(df: DataFrame, tag: str) -> DataFrame:
        vi = F.round(F.col(value_col).cast("double") * quant).cast("long")
        return df.select(vi.alias("_vi")).agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.sum("_vi").alias(f"_s1_{tag}"),
            F.sum(F.col("_vi") * F.col("_vi")).alias(f"_s2_{tag}"),
        )

    joined = moments(df_a, "a").crossJoin(moments(df_b, "b"))
    q = float(quant)

    def stats(tag: str):
        n = F.col(f"n_{tag}")
        s1 = F.col(f"_s1_{tag}")
        s2 = F.col(f"_s2_{tag}")
        mean = s1 / q / n
        # sample variance in value units: (n*Σx² - (Σx)²) / (n*(n-1)*q²).
        # The products run in DOUBLE (s1² overflows long under ANSI);
        # both engines evaluate the identical IEEE sequence, so the
        # (deterministic) cancellation error matches bit for bit.
        var = (
            (
                n.cast("double") * s2.cast("double")
                - s1.cast("double") * s1.cast("double")
            )
            / (n * (n - 1)).cast("double")
            / F.lit(q * q)
        )
        return mean, var

    mean_a, var_a = stats("a")
    mean_b, var_b = stats("b")
    se_a = var_a / F.col("n_a")
    se_b = var_b / F.col("n_b")
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2)
    t = F.when(ok, (mean_a - mean_b) / F.sqrt(se_a + se_b))
    dof = F.when(
        ok,
        (se_a + se_b)
        * (se_a + se_b)
        / (
            se_a * se_a / (F.col("n_a") - 1)
            + se_b * se_b / (F.col("n_b") - 1)
        ),
    )
    return joined.select(
        "n_a",
        mean_a.alias("mean_a"),
        "n_b",
        mean_b.alias("mean_b"),
        t.alias("t"),
        dof.alias("dof"),
    )


def welch_ttest_sql(
    a_sql: str,
    b_sql: str,
    value_expr: str,
    *,
    quant: int = 1000,
) -> str:
    """DuckDB oracle for :func:`welch_ttest` (same integer moments and
    double expression order)."""
    q = float(quant)

    def mom(src: str, tag: str) -> str:
        return (
            f"SELECT COUNT(*) AS n_{tag}, "
            f"SUM(CAST(ROUND(CAST({value_expr} AS DOUBLE) * {quant}) "
            f"AS BIGINT)) AS s1_{tag}, "
            f"SUM(CAST(ROUND(CAST({value_expr} AS DOUBLE) * {quant}) "
            f"AS BIGINT) * CAST(ROUND(CAST({value_expr} AS DOUBLE) "
            f"* {quant}) AS BIGINT)) AS s2_{tag} "
            f"FROM ({src})"
        )

    mean_a = f"s1_a / {q!r} / n_a"
    mean_b = f"s1_b / {q!r} / n_b"
    var_a = (
        "(CAST(n_a AS DOUBLE) * CAST(s2_a AS DOUBLE)"
        " - CAST(s1_a AS DOUBLE) * CAST(s1_a AS DOUBLE))"
        f" / CAST(n_a * (n_a - 1) AS DOUBLE) / {q * q!r}"
    )
    var_b = (
        "(CAST(n_b AS DOUBLE) * CAST(s2_b AS DOUBLE)"
        " - CAST(s1_b AS DOUBLE) * CAST(s1_b AS DOUBLE))"
        f" / CAST(n_b * (n_b - 1) AS DOUBLE) / {q * q!r}"
    )
    se_a = f"({var_a}) / n_a"
    se_b = f"({var_b}) / n_b"
    ok = "n_a >= 2 AND n_b >= 2"
    return f"""
SELECT n_a, {mean_a} AS mean_a, n_b, {mean_b} AS mean_b,
       CASE WHEN {ok} THEN
         ({mean_a} - {mean_b}) / SQRT({se_a} + {se_b}) END AS t,
       CASE WHEN {ok} THEN
         ({se_a} + {se_b}) * ({se_a} + {se_b})
         / (({se_a}) * ({se_a}) / (n_a - 1)
            + ({se_b}) * ({se_b}) / (n_b - 1)) END AS dof
FROM ({mom(a_sql, 'a')}) a CROSS JOIN ({mom(b_sql, 'b')}) b
"""
