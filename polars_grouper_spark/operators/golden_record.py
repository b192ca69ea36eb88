"""Golden-record survivorship: collapse an entity's conflicting source
records into one best row.

The master-data step every entity-resolution pipeline ends with (and the
record form LLM-profile/feature stores want): an entity appears in many
source records — partial, stale, conflicting — and each output column
must carry the SURVIVING value under an explicit rule.  The rule here is
the standard one: latest non-null wins, where "latest" is (timestamp,
record id) so ties cannot depend on partitioning.

Plan: ONE groupBy over the entity key; each output column is a single
``max(struct(has_value, ts, id, value))`` aggregate — lexicographic
struct ordering implements "non-null first, then newest, then highest
id" as a map-side-combinable max, so survivorship costs exactly one
shuffle of pre-reduced rows regardless of how many records an entity
has (the hot-entity skew case collapses map-side).  No windows, no
joins, no per-column passes.

The DuckDB oracle deliberately avoids struct-comparison semantics and
replays the rule as one ``row_number`` CTE per column (ORDER BY
has DESC, ts DESC, id DESC) — provably the same pick because the
(has, ts, id) key is a total order per entity.

Reference surface: none (beyond-reference operator, SURVEY.md §2
extension list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def golden_record(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_cols: "list[str]",
) -> DataFrame:
    """One row per ``key_col`` -> ``(key, n_records, last_ts,
    *value_cols)`` where each value is the latest-non-null survivor
    under the (non-null, ts, id) total order."""
    if not value_cols:
        raise ValueError("golden_record needs at least one value column")
    aggs = [
        F.count(F.lit(1)).alias("n_records"),
        F.max(F.col(ts_col)).alias("last_ts"),
    ]
    for c in value_cols:
        pick = F.max(
            F.struct(
                F.col(c).isNotNull().cast("int").alias("has"),
                F.col(ts_col).alias("ts"),
                F.col(id_col).alias("id"),
                F.col(c).alias("v"),
            )
        )
        aggs.append(pick.getField("v").alias(c))
    return df.groupBy(F.col(key_col).alias("key")).agg(*aggs)


def golden_record_sql(
    rel_sql: str,
    key_expr: str,
    ts_expr: str,
    id_expr: str,
    value_exprs: "dict[str, str]",
) -> str:
    """DuckDB oracle for :func:`golden_record`.  ``value_exprs`` maps
    output column name -> SQL expression; each gets its own
    latest-non-null row_number CTE, all joined back on the key."""
    base = (
        f"SELECT {key_expr} AS key, {ts_expr} AS ts, {id_expr} AS id, "
        + ", ".join(f"{e} AS {name}" for name, e in value_exprs.items())
        + f" FROM ({rel_sql})"
    )
    ctes = [f"base AS ({base})"]
    joins = []
    for name in value_exprs:
        ctes.append(
            f"pick_{name} AS ("
            f"SELECT key, {name} FROM ("
            f"SELECT key, {name}, ROW_NUMBER() OVER (PARTITION BY key "
            f"ORDER BY ({name} IS NOT NULL) DESC, ts DESC, id DESC) AS rn "
            f"FROM base) WHERE rn = 1)"
        )
        joins.append(f"JOIN pick_{name} USING (key)")
    head = (
        "SELECT key, COUNT(*) AS n_records, MAX(ts) AS last_ts "
        "FROM base GROUP BY key"
    )
    cols = ", ".join(f"pick_{n}.{n}" for n in value_exprs)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT agg.key, agg.n_records, agg.last_ts, {cols}\n"
        + f"FROM ({head}) agg "
        + " ".join(joins)
    )
