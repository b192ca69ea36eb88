"""Sorted-neighborhood blocking: entity-resolution candidates from a
sliding window over ONE global sort.

The classic alternative to key blocking (`functions.fuzzy`,
`entity_clusters`' fuzzy blocks): sort all records by a blocking key
(name, normalized address), slide a window of size ``w``, and emit every
pair inside the window.  Where key blocking misses pairs that disagree
on the block (typo in the first character), sorted-neighborhood catches
anything the SORT brings near — and its candidate count is EXACTLY
``w - 1`` pairs per record, a linear budget fixed in advance, where key
blocking's hot block can go quadratic.

Spark shape: one global rank (the same sort any ordered blocking pays),
then ``w - 1`` self-equality-joins on ``rank + i`` — the phrase-search
join pattern, all equality-keyed, no theta join and no window-function
self-cross.  Production multi-pass usage (run with 2-3 different sort
keys, union, dedup) composes by calling this per key.

Reference surface: none (beyond-reference operator, SURVEY.md §2
extension list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_col: str,
    window: int = 3,
) -> DataFrame:
    """Candidate pairs -> ``(id_a, id_b, key_a, key_b)`` for every two
    records within ``window`` positions of each other in (sort_col, id)
    order; ``id_a`` is the earlier-ranked record."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    w = Window.orderBy(F.col(sort_col).asc(), F.col(id_col).asc())
    ranked = df.select(
        F.col(id_col).alias("id"),
        F.col(sort_col).alias("key"),
        F.row_number().over(w).alias("rn"),
    )
    out = None
    for i in range(1, window):
        right = ranked.select(
            (F.col("rn") - i).alias("rn"),
            F.col("id").alias("id_b"),
            F.col("key").alias("key_b"),
        )
        part = ranked.join(right, "rn").select(
            F.col("id").alias("id_a"),
            "id_b",
            F.col("key").alias("key_a"),
            "key_b",
        )
        out = part if out is None else out.unionByName(part)
    return out


def sorted_neighborhood_pairs_sql(
    rel_sql: str,
    id_expr: str,
    sort_expr: str,
    window: int = 3,
) -> str:
    """DuckDB oracle for :func:`sorted_neighborhood_pairs` (same rank
    joins, unioned per offset)."""
    arms = " UNION ALL ".join(
        f"SELECT a.id AS id_a, b.id AS id_b, a.key AS key_a, b.key AS key_b "
        f"FROM ranked a JOIN ranked b ON b.rn = a.rn + {i}"
        for i in range(1, window)
    )
    return f"""
WITH ranked AS (
  SELECT {id_expr} AS id, {sort_expr} AS key,
         ROW_NUMBER() OVER (ORDER BY {sort_expr} ASC, {id_expr} ASC) AS rn
  FROM ({rel_sql})
)
{arms}
"""
