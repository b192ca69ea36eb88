"""Declarative data-quality expectations over a DataFrame.

The "don't ship a broken partition" gate every production pipeline runs
before publishing: null checks, uniqueness, value ranges, format
regexes, referential integrity.  Inspired by the expectations style of
Great Expectations / Deequ (public tools), re-expressed as plain
Catalyst aggregations:

- ALL row-local rules (not-null, range, regex) and uniqueness fold into
  ONE aggregation over ONE scan — each rule is a conditional sum, and
  uniqueness is ``count(rows with non-null key) - count_distinct(key)``
  in the same pass.  Adding a rule adds an expression, not a job.
- Each referential-integrity rule is one left-anti join against the
  (deduplicated, usually broadcastable) reference keys — the only rule
  class that cannot share the scan.

Output is rule-count rows (``(rule, n_violations)``) — bounded by the
number of rules, never by the data, so the gate itself is free to run
at 100 TB.

Reference surface: none (beyond-reference operator, SURVEY.md §2
extension list).
"""

from __future__ import annotations

import math
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def validate(
    df: DataFrame,
    *,
    not_null: Sequence[str] = (),
    unique: Sequence[str] = (),
    ranges: "Mapping[str, tuple[float, float]] | None" = None,
    regex: "Mapping[str, str] | None" = None,
    foreign: "Mapping[str, tuple[DataFrame, str]] | None" = None,
) -> DataFrame:
    """Violation counts per rule -> ``(rule, n_violations)``.

    Rule names are ``kind:column`` (stable output schema regardless of
    data).  Range bounds are inclusive; range/regex rules only count
    NON-NULL violators (pair them with ``not_null`` to also reject
    nulls); ``unique`` counts the rows beyond the first occurrence of
    each non-null key; ``foreign`` counts non-null values missing from
    the reference column."""
    entries: "list[tuple[str, object]]" = []
    for c in not_null:
        entries.append(
            (f"not_null:{c}", F.sum(F.col(c).isNull().cast("long")))
        )
    for c in unique:
        entries.append(
            (
                f"unique:{c}",
                F.sum(F.col(c).isNotNull().cast("long"))
                - F.count_distinct(F.col(c)),
            )
        )
    for c, (lo, hi) in (ranges or {}).items():
        entries.append(
            (
                f"range:{c}",
                F.sum(
                    (
                        F.col(c).isNotNull()
                        & ~F.col(c).between(F.lit(lo), F.lit(hi))
                    ).cast("long")
                ),
            )
        )
    for c, pat in (regex or {}).items():
        entries.append(
            (
                f"regex:{c}",
                F.sum(
                    (F.col(c).isNotNull() & ~F.col(c).rlike(pat)).cast(
                        "long"
                    )
                ),
            )
        )
    out = None
    if entries:
        row = df.agg(
            *[e.alias(f"_r{i}") for i, (_, e) in enumerate(entries)]
        )
        pairs = []
        for i, (name, _) in enumerate(entries):
            pairs.append(F.lit(name))
            pairs.append(F.coalesce(F.col(f"_r{i}"), F.lit(0)).cast("long"))
        out = row.select(
            F.explode(F.create_map(*pairs)).alias("rule", "n_violations")
        )
    for c, (ref, ref_col) in (foreign or {}).items():
        cnt = (
            df.where(F.col(c).isNotNull())
            .join(
                F.broadcast(ref.select(F.col(ref_col).alias(c)).distinct()),
                c,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .select(F.lit(f"foreign:{c}").alias("rule"), "n_violations")
        )
        out = cnt if out is None else out.unionAll(cnt)
    if out is None:
        raise ValueError("validate() called with no rules")
    return out

def fk_audit(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    *,
    sample_orphans: int = 5,
) -> DataFrame:
    """Referential-integrity audit -> ONE row ``(n_child, n_null_keys,
    n_orphans, orphan_share, sample_orphan_keys)``: how many child rows
    reference a parent key that does not exist.

    The cross-table complement of :func:`validate`'s row-local rules —
    run before a join-dependent pipeline to learn whether a left join's
    nulls mean "missing data" or "broken foreign keys".

    Plan: parent side reduced to DISTINCT keys first (the shuffle
    carries keys, never parent payloads), LEFT ANTI join for orphans,
    map-side-combinable counts; the per-key sample is a bounded
    ``collect_set``-style slice (``sort_array`` + ``slice`` for
    determinism), never a driver collect of the orphan set.
    """
    if sample_orphans < 0:
        raise ValueError(f"sample_orphans must be >= 0, got {sample_orphans}")
    from polars_grouper_spark.plans.iteration import truncate_lineage

    ck = F.col(child_key)
    # One string column, consumed by both the total/null counts and the
    # orphan anti join — materialize once instead of re-scanning the
    # child table per consumer.
    keys = truncate_lineage(child.select(ck.cast("string").alias("_k")))
    n_child = keys.agg(
        F.count(F.lit(1)).alias("n_child"),
        F.sum(F.when(F.col("_k").isNull(), 1).otherwise(0)).alias("n_null_keys"),
    )
    parents = parent.select(
        F.col(parent_key).cast("string").alias("_k")
    ).where(F.col("_k").isNotNull()).distinct()
    orphans = (
        keys.where(F.col("_k").isNotNull())
        .join(parents, "_k", "left_anti")
        .agg(
            F.count(F.lit(1)).alias("n_orphans"),
            F.slice(
                F.sort_array(F.collect_set("_k")), 1, sample_orphans
            ).alias("sample_orphan_keys"),
        )
    )
    return n_child.crossJoin(orphans).select(
        "n_child",
        "n_null_keys",
        "n_orphans",
        F.round(F.col("n_orphans") / F.greatest(F.col("n_child"), F.lit(1)), 6).alias(
            "orphan_share"
        ),
        "sample_orphan_keys",
    )


def fk_audit_sql(
    child_sql: str,
    parent_sql: str,
    child_key: str,
    parent_key: str,
    *,
    sample_orphans: int = 5,
) -> str:
    """DuckDB oracle for :func:`fk_audit` (sample list rendered as a
    sorted LIST to match Spark's sort_array + slice)."""
    return f"""
WITH ck AS (
  SELECT CAST({child_key} AS VARCHAR) AS k FROM ({child_sql})
),
pk AS (
  SELECT DISTINCT CAST({parent_key} AS VARCHAR) AS k FROM ({parent_sql})
  WHERE {parent_key} IS NOT NULL
),
counts AS (
  SELECT count(*)::BIGINT AS n_child,
         sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_keys
  FROM ck
),
orph AS (
  SELECT count(*)::BIGINT AS n_orphans,
         coalesce(list_sort(list(DISTINCT k))[1:{sample_orphans}], [])
           AS sample_orphan_keys
  FROM ck ANTI JOIN pk USING (k) WHERE ck.k IS NOT NULL
)
SELECT c.n_child, c.n_null_keys, o.n_orphans,
       round(o.n_orphans / greatest(c.n_child, 1), 6) AS orphan_share,
       o.sample_orphan_keys
FROM counts c, orph o
"""


def fd_audit(
    df,
    determinant_cols: "list[str]",
    dependent_col: str,
    *,
    sample_violations: int = 5,
):
    """Functional-dependency audit: does ``determinant_cols → dependent_col``
    hold?  -> one row ``(n_groups, n_violating_groups, fd_holds,
    sample_keys)``.

    The schema-discovery / data-contract primitive ("is product_id →
    product_name actually a function?") run BEFORE trusting a dimension
    join or a dedup-by-key.  One aggregation: group by the determinant,
    ``count(distinct dependent)`` per group (map-side partial on the
    grouped shuffle), then a metadata-sized rollup; the violation sample
    is a bounded sorted slice of group keys, never a data collect.

    Nulls: rows with a NULL determinant component are excluded (SQL
    grouping would conflate them); a NULL dependent counts as a distinct
    value (a key mapping to both NULL and 'x' violates the FD).
    """
    from pyspark.sql import functions as F

    notnull = F.lit(True)
    for c in determinant_cols:
        notnull = notnull & F.col(c).isNotNull()
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in determinant_cols])
    per_group = (
        df.where(notnull)
        .groupBy(key.alias("_key"))
        .agg(
            F.count_distinct(
                F.coalesce(F.col(dependent_col).cast("string"), F.lit("\x00null"))
            ).alias("_nvals")
        )
    )
    viol = per_group.where(F.col("_nvals") > 1)
    # TakeOrdered (orderBy+limit) bounds the sample BEFORE any collect —
    # a wildly-violating FD still only moves sample_violations keys.
    sample = (
        viol.orderBy("_key")
        .limit(sample_violations)
        .agg(F.sort_array(F.collect_list("_key")).alias("sample"))
    )
    counts = per_group.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("_nvals") > 1).cast("long")).alias("n_violating_groups"),
    )
    return counts.crossJoin(sample).select(
        "n_groups",
        "n_violating_groups",
        (F.col("n_violating_groups") == 0).alias("fd_holds"),
        F.array_join("sample", ",").alias("sample_keys"),
    )


def fd_audit_sql(
    src_sql: str,
    determinant_exprs: "list[str]",
    dependent_expr: str,
    *,
    sample_violations: int = 5,
) -> str:
    """DuckDB oracle for :func:`fd_audit`."""
    notnull = " AND ".join(f"{e} IS NOT NULL" for e in determinant_exprs)
    key = " || '|' || ".join(f"CAST({e} AS VARCHAR)" for e in determinant_exprs)
    return f"""
WITH src AS ({src_sql}),
per_group AS (
  SELECT {key} AS k,
         count(DISTINCT coalesce(CAST({dependent_expr} AS VARCHAR), chr(1))) AS nvals
  FROM src WHERE {notnull} GROUP BY 1
),
viol AS (SELECT k FROM per_group WHERE nvals > 1),
samp AS (
  SELECT coalesce(string_agg(k, ','), '') AS sample_keys
  FROM (SELECT k FROM viol ORDER BY k LIMIT {sample_violations})
)
SELECT (SELECT count(*) FROM per_group)::BIGINT AS n_groups,
       (SELECT count(*) FROM viol)::BIGINT AS n_violating_groups,
       (SELECT count(*) FROM viol) = 0 AS fd_holds,
       sample_keys
FROM samp
"""


_BENFORD_P = {d: math.log10(1 + 1 / d) for d in range(1, 10)}


def benford_audit(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law first-digit audit -> 9 rows ``(digit, cnt,
    obs_share, exp_share, contrib)``.

    The forensic data-quality screen for "naturally grown" magnitude
    columns (amounts, populations, file sizes): genuine multiplicative
    data puts digit d first with probability ``log10(1 + 1/d)``;
    fabricated or truncated feeds don't.  ``contrib`` is the per-digit
    ``(obs - exp)^2 / exp`` chi-square term over shares — large
    contributions point at WHICH digit is distorted.

    ``col`` must be a positive integral column (quantize floats to
    cents first): the first digit comes from the long's string form —
    never from ``floor(log10(x))``, whose 1-ulp libm wobble at exact
    powers of ten would misbucket boundary values per engine.  One
    map-side-combinable groupBy on a 9-value key; the expected shares
    are compile-time Python literals, identical in both plans.
    """
    d = F.substring(F.col(col).cast("long").cast("string"), 1, 1).cast("int")
    counts = (
        df.where(F.col(col) > 0)
        .groupBy(d.alias("digit"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n = F.sum("cnt").over(Window.partitionBy())
    obs = F.col("cnt") / n.cast("double")
    exp_ = F.element_at(
        F.create_map(
            *[x for dd in range(1, 10) for x in (F.lit(dd), F.lit(_BENFORD_P[dd]))]
        ),
        F.col("digit"),
    )
    return counts.select(
        "digit",
        "cnt",
        obs.alias("obs_share"),
        exp_.alias("exp_share"),
        ((obs - exp_) * (obs - exp_) / exp_).alias("contrib"),
    )


def benford_audit_sql(rel_sql: str, expr: str) -> str:
    """DuckDB oracle for :func:`benford_audit` (same string-form digit
    and the same Python-literal expected shares)."""
    # CAST: a bare high-precision literal parses as DECIMAL in DuckDB
    cases = " ".join(
        f"WHEN {d} THEN CAST({_BENFORD_P[d]!r} AS DOUBLE)"
        for d in range(1, 10)
    )
    return f"""
WITH counts AS (
  SELECT CAST(substr(CAST(CAST({expr} AS BIGINT) AS VARCHAR), 1, 1) AS INT)
           AS digit,
         COUNT(*) AS cnt
  FROM ({rel_sql}) WHERE {expr} > 0 GROUP BY 1
)
SELECT digit, cnt,
       cnt / CAST(SUM(cnt) OVER () AS DOUBLE) AS obs_share,
       CASE digit {cases} END AS exp_share,
       (cnt / CAST(SUM(cnt) OVER () AS DOUBLE) - CASE digit {cases} END)
         * (cnt / CAST(SUM(cnt) OVER () AS DOUBLE) - CASE digit {cases} END)
         / (CASE digit {cases} END) AS contrib
FROM counts
"""


def quarantine(
    df: DataFrame,
    rules: "Sequence[tuple[str, Column]]",
    id_col: str,
) -> DataFrame:
    """Bad-row side-output routing -> ``(id, reasons)`` for every row
    violating at least one rule, ``reasons`` the comma-joined rule
    names in declaration order — the quarantine stream of a
    validating ingest pipeline (:func:`validate` counts violations;
    this returns the rows so they can be parked and replayed).

    Entirely row-local (scan speed, no shuffle): each rule is a boolean
    column, the reasons string is a concat_ws over per-rule CASE
    expressions, and clean rows are filtered out before anything
    materializes."""
    if not rules:
        raise ValueError("quarantine() called with no rules")
    parts = [
        F.when(cond, F.lit(name)) for name, cond in rules
    ]
    reasons = F.concat_ws(",", *parts)
    return (
        df.select(F.col(id_col).alias("id"), reasons.alias("reasons"))
        .where(F.col("reasons") != "")
    )


def quarantine_sql(
    src_sql: str, rules: "Sequence[tuple[str, str]]", id_expr: str
) -> str:
    """DuckDB oracle for :func:`quarantine` — rules as (name,
    SQL-predicate) pairs."""
    parts = ", ".join(
        f"CASE WHEN {pred} THEN '{name}' END" for name, pred in rules
    )
    return f"""
SELECT id, reasons FROM (
  SELECT {id_expr} AS id,
         concat_ws(',', {parts}) AS reasons
  FROM ({src_sql})
) WHERE reasons <> ''
"""
