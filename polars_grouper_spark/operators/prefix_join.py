"""Longest-prefix join — routing-table / taxonomy matching as a join.

The lookup every URL-classification, IP-routing, file-path-policy, and
category-taxonomy pipeline needs: match each fact string to the MOST
SPECIFIC (longest) entry of a prefix dimension.  The naive plan is a
``LIKE`` theta-join (cross product with a per-pair prefix test — dead at
any scale).  The Spark-first reshape turns it into an EQUALITY join:

1. The dim's DISTINCT prefix LENGTHS are collected — metadata bounded
   by the dim's length domain (URL rules rarely exceed a few dozen
   distinct lengths; a guard raises past ``max_lengths``).
2. Each fact row explodes to one candidate ``substr(s, 1, L)`` per
   distinct length — fan-out = |lengths|, a constant, NOT |dim|.
3. Candidates equality-join the prefix dim (broadcast when small), and
   ``max_by(prefix, length)`` per fact row keeps the longest match —
   deterministic because two distinct prefixes of one string cannot
   share a length.

One scan of the fact side, fan-out |lengths|, one equality join, one
key-grouped reduction.  At 100 TB the fact scan dominates and the whole
match runs at scan speed with a broadcast dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prefix_join(
    fact: DataFrame,
    dim: DataFrame,
    id_col: str,
    fact_col: str,
    prefix_col: str,
    *,
    how: str = "left",
    max_lengths: int = 128,
) -> DataFrame:
    """Longest-prefix match -> ``(id, value, matched_prefix)`` with
    ``matched_prefix`` NULL for unmatched rows under ``how='left'``
    (``'inner'`` drops them).

    ``dim`` rows with NULL prefixes are ignored.  Raises if the dim has
    more than ``max_lengths`` distinct prefix lengths (the fan-out
    bound — a dim that diverse wants a different operator, e.g. a trie
    sharded by first segment)."""
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left/inner, got {how}")
    pfx = dim.where(F.col(prefix_col).isNotNull()).select(
        F.col(prefix_col).cast("string").alias("_pfx")
    ).distinct()
    lens = sorted(
        r["_l"] for r in pfx.select(F.length("_pfx").alias("_l")).distinct().collect()
    )
    if len(lens) > max_lengths:
        raise ValueError(
            f"dim has {len(lens)} distinct prefix lengths > max_lengths="
            f"{max_lengths}; shard the dim or raise the cap"
        )
    base = fact.select(
        F.col(id_col).alias("id"), F.col(fact_col).cast("string").alias("value")
    )
    if not lens:
        out = base.select("id", "value", F.lit(None).cast("string").alias("matched_prefix"))
        return out if how == "left" else out.where(F.lit(False))
    cand = base.select(
        "id",
        "value",
        F.explode(
            F.array_distinct(
                F.array(*[F.substring("value", 1, l) for l in lens])
            )
        ).alias("_pfx"),
    )
    hits = (
        cand.join(F.broadcast(pfx), "_pfx")
        .groupBy("id", "value")
        .agg(F.max_by("_pfx", F.length("_pfx")).alias("matched_prefix"))
    )
    if how == "inner":
        return hits.select("id", "value", "matched_prefix")
    return base.join(hits.select("id", "matched_prefix"), "id", "left").select(
        "id", "value", "matched_prefix"
    )


def prefix_join_sql(
    fact_sql: str,
    dim_sql: str,
    id_expr: str,
    fact_expr: str,
    prefix_expr: str,
    *,
    how: str = "left",
) -> str:
    """DuckDB oracle for :func:`prefix_join` — identical candidate
    construction (distinct lengths from the dim, substr equality join,
    longest wins)."""
    join_kw = "LEFT" if how == "left" else "INNER"
    return f"""
WITH fact AS (
  SELECT {id_expr} AS id, CAST({fact_expr} AS VARCHAR) AS value
  FROM ({fact_sql})
),
pfx AS (
  SELECT DISTINCT CAST({prefix_expr} AS VARCHAR) AS pfx FROM ({dim_sql})
  WHERE {prefix_expr} IS NOT NULL
),
lens AS (SELECT DISTINCT len(pfx) AS l FROM pfx),
cand AS (
  SELECT DISTINCT f.id, f.value, substr(f.value, 1, l.l) AS c
  FROM fact f, lens l
),
hits AS (
  SELECT c.id, arg_max(c.c, len(c.c)) AS matched_prefix
  FROM cand c JOIN pfx p ON p.pfx = c.c
  GROUP BY c.id
)
SELECT f.id, f.value, h.matched_prefix
FROM fact f {join_kw} JOIN hits h ON h.id = f.id
"""
