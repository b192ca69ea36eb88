"""PII detection / redaction over document tables — JVM-side regex only.

A training-data pipeline has to strip contact info before text reaches a
model.  This module does it with built-in ``regexp_count`` /
``regexp_replace`` expressions (whole-stage codegen, no UDFs), with
patterns written in the common subset of Java regex (Spark) and RE2
(DuckDB) so the correctness oracle can replicate them bit-for-bit.

Patterns are applied in a fixed order (URL first) so that an address
embedded in a URL is attributed to the URL, not double-counted: each
pattern counts and redacts the *already-redacted-so-far* text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Order matters: URL swallows embedded emails/IPs before those run.
PII_PATTERNS: "list[tuple[str, str]]" = [
    ("url", r"https?://[^\s]+"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def _token(kind: str) -> str:
    return f"<{kind.upper()}>"


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Count and redact PII -> ``(id, n_url, n_email, n_ipv4, redacted)``.

    Each pattern is counted on, then replaced in, the output of the
    previous stage, so counts are exactly "occurrences this scrub
    replaced".  Everything is a projection chain over one scan — no
    shuffle, embarrassingly parallel at any scale.
    """
    out = df.select(F.col(id_col), F.col(text_col).alias("_t"))
    counts = []
    for kind, pat in PII_PATTERNS:
        out = out.select(
            "*", F.regexp_count(F.col("_t"), F.lit(pat)).cast("long").alias(f"n_{kind}")
        )
        out = out.withColumn("_t", F.regexp_replace("_t", pat, _token(kind)))
        counts.append(f"n_{kind}")
    return out.select(F.col(id_col), *counts, F.col("_t").alias("redacted"))


def pii_scrub_sql(
    table: str = "documents", id_expr: str = "doc_id", text_expr: str = "text"
) -> str:
    """DuckDB SQL replicating :func:`pii_scrub` over ``table`` (same
    pattern order, same sequential count-then-redact semantics)."""
    chain = [f"t0 AS (SELECT {id_expr} AS id, {text_expr} AS txt FROM {table})"]
    for i, (kind, pat) in enumerate(PII_PATTERNS):
        carried = "".join(f"n_{k}, " for k, _ in PII_PATTERNS[:i])
        chain.append(
            f"t{i + 1} AS (SELECT id, {carried}"
            f"len(regexp_extract_all(txt, '{pat}'))::BIGINT AS n_{kind}, "
            f"regexp_replace(txt, '{pat}', '{_token(kind)}', 'g') AS txt "
            f"FROM t{i})"
        )
    cols = ", ".join(f"n_{k}" for k, _ in PII_PATTERNS)
    return (
        "WITH "
        + ", ".join(chain)
        + f" SELECT id, {cols}, txt AS redacted FROM t{len(PII_PATTERNS)}"
    )


def k_anonymity_violations(
    df: DataFrame, quasi_cols: "list[str]", k: int = 5
) -> DataFrame:
    """k-anonymity audit -> the quasi-identifier combinations whose
    group size is below ``k`` (each row here is a re-identification
    risk: fewer than k individuals share the combination).  Returns
    ``(*quasi_cols, n_rows)`` for violating groups only — the
    privacy-gate readout before a dataset export.

    One map-side-combinable aggregation on the quasi-identifier key;
    output is at most |violating groups| rows (the safe groups, the
    overwhelming majority at scale, never leave the aggregate)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") < k)
    )


def k_anonymity_violations_sql(
    src_sql: str, quasi_cols: "list[str]", k: int = 5
) -> str:
    """DuckDB oracle for :func:`k_anonymity_violations`."""
    cols = ", ".join(quasi_cols)
    return (
        f"SELECT {cols}, count(*) AS n_rows FROM ({src_sql}) "
        f"GROUP BY {cols} HAVING count(*) < {k}"
    )
