"""Bipartiteness check + 2-coloring — node-doubled connected components.

Is the graph 2-colorable (users-vs-items, buyers-vs-sellers, any
matching precondition)?  The distributed trick avoids BFS parity
entirely: double every node u into (u#0, u#1) and turn each edge (u, v)
into (u#0, v#1) and (u#1, v#0).  A component is bipartite iff no node's
two copies land in the same doubled component — an odd cycle is exactly
a walk that flips parity back onto itself, which in the doubled graph
is a path from u#0 to u#1.  So the whole check is ONE run of the
existing connected-components operator (``operators.connected_components
.components``) on a 2x edge list — no new iterative kernel, no parity
state, and the oracle replays the same min-label propagation.

When a component IS bipartite its doubled copies split into exactly two
doubled components {X, Y}; side(u) = 0 iff u#0 sits in the
lexicographically smaller one — a deterministic proper 2-coloring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .connected_components import components


def bipartite_check(
    df: DataFrame,
    src: str = "from",
    dst: str = "to",
    *,
    max_local_edges: int | None = None,
) -> DataFrame:
    """-> ``(node, comp, side, is_bipartite)`` for every node: ``comp``
    the canonical (min-name) component label of the ORIGINAL graph,
    ``side`` the 2-coloring (0/1, NULL when the component is not
    bipartite), ``is_bipartite`` the component-level verdict (identical
    for all nodes of a component by construction).  Self-loops are odd
    cycles and correctly poison their component; null endpoints drop."""
    s = F.col(src).cast("string")
    d = F.col(dst).cast("string")
    e = df.where(s.isNotNull() & d.isNotNull()).select(
        s.alias("u"), d.alias("v")
    )
    doubled = e.select(
        F.concat(F.col("u"), F.lit("#0")).alias("src"),
        F.concat(F.col("v"), F.lit("#1")).alias("dst"),
    ).unionAll(
        e.select(
            F.concat(F.col("u"), F.lit("#1")).alias("src"),
            F.concat(F.col("v"), F.lit("#0")).alias("dst"),
        )
    )
    # max_local_edges forwards into the inner CC so per-call 0 disables
    # its local tier/count probe transitively (conf route also works)
    cc = components(doubled, "src", "dst", max_local_edges=max_local_edges)
    split = cc.select(
        F.expr("substring(node, 1, length(node) - 2)").alias("node"),
        F.substring(F.col("node"), -1, 1).alias("_tag"),
        "component",
    )
    pivot = split.groupBy("node").agg(
        F.min(F.when(F.col("_tag") == "0", F.col("component"))).alias("_l0"),
        F.min(F.when(F.col("_tag") == "1", F.col("component"))).alias("_l1"),
    )
    lo = F.least(F.col("_l0"), F.col("_l1"))
    return pivot.select(
        "node",
        F.expr(
            "substring(least(_l0, _l1), 1, length(least(_l0, _l1)) - 2)"
        ).alias("comp"),
        F.when(F.col("_l0") == F.col("_l1"), F.lit(None).cast("int"))
        .when(F.col("_l0") < F.col("_l1"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("side"),
        (F.col("_l0") != F.col("_l1")).alias("is_bipartite"),
    )


def bipartite_check_sql(edge_sql: str, *, rounds: int = 16) -> str:
    """DuckDB oracle for :func:`bipartite_check`: the same node-doubling
    feeding unrolled min-label propagation (``rounds`` must cover the
    DOUBLED graph's diameter — roughly twice the original's; an
    unconverged run mismatches loudly, it cannot silently pass)."""
    parts = [
        f"WITH raw AS ({edge_sql})",
        ", ed AS MATERIALIZED ("
        "SELECT CAST(src AS VARCHAR) || '#0' AS src, CAST(dst AS VARCHAR) || '#1' AS dst"
        " FROM raw WHERE src IS NOT NULL AND dst IS NOT NULL"
        " UNION ALL "
        "SELECT CAST(src AS VARCHAR) || '#1', CAST(dst AS VARCHAR) || '#0'"
        " FROM raw WHERE src IS NOT NULL AND dst IS NOT NULL)",
        ", eb AS MATERIALIZED (SELECT src AS u, dst AS v FROM ed"
        " UNION SELECT dst, src FROM ed)",
        ", l0 AS MATERIALIZED (SELECT u AS node, min(least(u, v)) AS lbl"
        " FROM eb GROUP BY u)",
    ]
    prev = "l0"
    for i in range(1, rounds + 1):
        parts.append(
            f", l{i} AS MATERIALIZED (SELECT n.node,"
            " least(n.lbl, coalesce(min(l.lbl), n.lbl)) AS lbl"
            f" FROM {prev} n LEFT JOIN eb ON eb.u = n.node"
            f" LEFT JOIN {prev} l ON l.node = eb.v GROUP BY n.node, n.lbl)"
        )
        prev = f"l{i}"
    parts.append(
        f""", piv AS (
  SELECT substr(node, 1, length(node) - 2) AS node,
         min(CASE WHEN node LIKE '%#0' THEN lbl END) AS l0,
         min(CASE WHEN node LIKE '%#1' THEN lbl END) AS l1
  FROM {prev} GROUP BY 1
)
SELECT node,
       substr(least(l0, l1), 1, length(least(l0, l1)) - 2) AS comp,
       CASE WHEN l0 = l1 THEN NULL
            WHEN l0 < l1 THEN 0 ELSE 1 END AS side,
       l0 <> l1 AS is_bipartite
FROM piv"""
    )
    return "\n".join(parts)
