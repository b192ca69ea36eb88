"""Semi-supervised label spreading over edge-list graphs.

Propagate a small set of seed labels to the rest of the graph (Zhu &
Ghahramani 2002's label propagation, synchronous variant): each round,
every non-seed node adopts the majority label of its labelled neighbors;
seed nodes stay clamped.  The classic semi-supervised node classifier a
training-data pipeline runs to extend sparse human labels (topic tags,
quality classes) across a similarity or interaction graph.

Determinism: the update is synchronous (all nodes read the previous
round's labels) and ties break by (count desc, label asc) — a total
order, so the result is engine-portable and the DuckDB oracle replays it
round for round.  This differs from the async random-order variant whose
output is run-dependent; at distributed scale only the synchronous form
is well-defined anyway.

Plan shape per round: one join of the (node, label) state against the
adjacency, one map-side-combinable (node, label) count, one per-node
window argmax (partitioned by node — skew equals the max degree of a
single node's distinct-label set, bounded by the label alphabet).  State
is O(labelled nodes); the adjacency is built once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.iteration import truncate_lineage


def label_spreading(
    df: DataFrame,
    seeds: DataFrame,
    src: str = "from",
    dst: str = "to",
    *,
    node_col: str = "node",
    label_col: str = "label",
    rounds: int = 5,
    directed: bool = False,
) -> DataFrame:
    """Spread ``seeds`` (``(node, label)`` DataFrame) for ``rounds``
    synchronous rounds -> ``(node, label)`` for every node labelled by
    then (unreached nodes are absent; seed labels are clamped).

    Nodes and labels are coerced to string (SURVEY.md §1.2); null
    endpoints drop the edge; self-loops are ignored (a node's own label
    does not vote — seeds are clamped anyway).
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    s = F.col(src).cast("string")
    d = F.col(dst).cast("string")
    edges = (
        df.where(s.isNotNull() & d.isNotNull() & (s != d))
        .select(s.alias("u"), d.alias("v"))
        .distinct()
    )
    if not directed:
        edges = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
    edges = truncate_lineage(edges)

    seed_tbl = truncate_lineage(
        seeds.select(
            F.col(node_col).cast("string").alias("node"),
            F.col(label_col).cast("string").alias("label"),
        ).distinct()
    )
    labels = seed_tbl

    w = Window.partitionBy("node").orderBy(F.col("n").desc(), F.col("label"))
    for _ in range(rounds):
        votes = (
            edges.join(
                labels.select(F.col("node").alias("u"), "label"), "u"
            )
            .groupBy(F.col("v").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        winners = (
            votes.select(
                "node", "label", F.row_number().over(w).alias("rk")
            )
            .where(F.col("rk") == 1)
            .select("node", "label")
        )
        # Seeds clamp: their label always wins over the vote.
        labels = seed_tbl.unionAll(winners.join(seed_tbl, "node", "left_anti"))
        # Checkpoint between rounds only (r10): the LAST round's state is
        # materialized by the caller's action; an eager localCheckpoint
        # there was one extra job per call for a plan only one round deep.
        if _ < rounds - 1:
            labels = truncate_lineage(labels)
    return labels


def label_spreading_sql(
    edge_sql: str,
    seed_sql: str,
    rounds: int = 5,
    directed: bool = False,
) -> str:
    """DuckDB oracle replaying :func:`label_spreading`: ``edge_sql``
    yields ``(src, dst)``, ``seed_sql`` yields ``(node, label)``."""
    mirror = (
        ""
        if directed
        else " UNION SELECT CAST(dst AS VARCHAR), CAST(src AS VARCHAR) FROM raw "
        "WHERE src IS NOT NULL AND dst IS NOT NULL "
        "AND CAST(src AS VARCHAR) <> CAST(dst AS VARCHAR)"
    )
    parts = [
        f"WITH raw AS ({edge_sql})",
        f""", e AS (
  SELECT DISTINCT CAST(src AS VARCHAR) AS u, CAST(dst AS VARCHAR) AS v
  FROM raw WHERE src IS NOT NULL AND dst IS NOT NULL
    AND CAST(src AS VARCHAR) <> CAST(dst AS VARCHAR){mirror}
)""",
        f""", seeds AS (
  SELECT DISTINCT CAST(node AS VARCHAR) AS node, CAST(label AS VARCHAR) AS label
  FROM ({seed_sql})
)""",
        ", l0 AS (SELECT node, label FROM seeds)",
    ]
    prev = "l0"
    for i in range(1, rounds + 1):
        parts.append(
            f""", v{i} AS (
  SELECT e.v AS node, l.label, count(*) AS n
  FROM e JOIN {prev} l ON l.node = e.u
  GROUP BY 1, 2
), w{i} AS (
  SELECT node, label,
         row_number() OVER (PARTITION BY node ORDER BY n DESC, label) AS rk
  FROM v{i}
), l{i} AS (
  SELECT node, label FROM seeds
  UNION ALL
  SELECT w.node, w.label FROM w{i} w
  ANTI JOIN seeds s ON s.node = w.node
  WHERE w.rk = 1
)"""
        )
        prev = f"l{i}"
    parts.append(f" SELECT node, label FROM {prev}")
    return "\n".join(parts)
