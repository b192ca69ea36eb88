"""Frequent itemset mining beyond pairs: Apriori level-3 triples.

`graph_association_rules` (the reference-parity operator) and
`copurchase_pairs` stop at 2-itemsets; real basket/co-occurrence
analysis wants the next level, and level 3 is where naive enumeration
explodes — a transaction with t items holds C(t,3) triples, so hub
transactions dominate cost unless candidates are pruned FIRST.

Apriori downward closure does the pruning relationally: a triple can be
frequent only if all three of its sub-pairs are frequent, so the plan

1. reduces transactions to distinct (tx, item) and counts items — one
   map-side-combinable groupBy; keep items with support >= min_support;
2. counts pairs WITHIN transactions restricted to frequent items — one
   within-tx self-join (a < b on the interned item order); keep
   frequent pairs;
3. enumerates candidate triples by joining frequent pairs sharing their
   lowest item ((a,b) + (a,c), b < c), semi-joins the third pair (b,c)
   against the frequent-pair set — candidates now satisfy closure —
   and only then counts true occurrences with one two-step semi-join
   back through the transaction table.

Every expansion is an equality join keyed on (tx) or (item, item);
the C(t,3) blowup never materializes because step 3's fan-out is
bounded by frequent-pair degree, not transaction width.  Counts are
exact integers; ordering ties cannot exist (a < b < c is a total
order on distinct items).

Reference surface: extends `graph_association_rules`
(reference `polars_grouper/__init__.py:455`) one Apriori level up;
beyond-reference operator (SURVEY.md §2 extension list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_triples(
    df: DataFrame,
    tx_col: str,
    item_col: str,
    min_support: int,
) -> DataFrame:
    """Frequent 3-itemsets -> ``(item_a, item_b, item_c, support)``
    with ``item_a < item_b < item_c`` (string order) and
    ``support >= min_support`` transactions containing all three."""
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    tx = df.select(
        F.col(tx_col).alias("tx"), F.col(item_col).cast("string").alias("it")
    ).distinct()

    f1 = (
        tx.groupBy("it")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_support)
        .select("it")
    )
    tx1 = tx.join(F.broadcast(f1), "it").select("tx", "it")

    pairs_in_tx = (
        tx1.alias("x")
        .join(tx1.alias("y"), "tx")
        .where(F.col("x.it") < F.col("y.it"))
        .select("tx", F.col("x.it").alias("a"), F.col("y.it").alias("b"))
    )
    f2 = (
        pairs_in_tx.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_support)
        .select("a", "b")
    )

    # candidate triples: two frequent pairs sharing the low item, third
    # sub-pair checked by closure
    cand = (
        f2.alias("p")
        .join(f2.alias("q"), F.col("p.a") == F.col("q.a"))
        .where(F.col("p.b") < F.col("q.b"))
        .select(
            F.col("p.a").alias("a"),
            F.col("p.b").alias("b"),
            F.col("q.b").alias("c"),
        )
        .join(
            f2.select(F.col("a").alias("b"), F.col("b").alias("c")),
            ["b", "c"],
            "left_semi",
        )
    )

    # exact support: a transaction holds the triple iff it holds pair
    # (a, b) and also item c
    support = (
        pairs_in_tx.join(F.broadcast(cand), ["a", "b"])
        .join(
            tx1.select("tx", F.col("it").alias("c")),
            ["tx", "c"],
            "left_semi",
        )
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )
    return support.select(
        F.col("a").alias("item_a"),
        F.col("b").alias("item_b"),
        F.col("c").alias("item_c"),
        "support",
    )


def frequent_triples_sql(
    rel_sql: str,
    tx_expr: str,
    item_expr: str,
    min_support: int,
) -> str:
    """DuckDB oracle for :func:`frequent_triples` — the direct
    three-way within-transaction join with a<b<c, provably the same
    multiset because Apriori pruning never drops a frequent triple."""
    return f"""
WITH tx AS (
  SELECT DISTINCT {tx_expr} AS tx, CAST({item_expr} AS VARCHAR) AS it
  FROM ({rel_sql})
)
SELECT x.it AS item_a, y.it AS item_b, z.it AS item_c,
       COUNT(*) AS support
FROM tx x JOIN tx y ON x.tx = y.tx AND x.it < y.it
         JOIN tx z ON y.tx = z.tx AND y.it < z.it
GROUP BY 1, 2, 3
HAVING COUNT(*) >= {min_support}
"""
