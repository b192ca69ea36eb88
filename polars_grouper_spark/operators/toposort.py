"""Topological levels: layer a DAG by iterative source peeling.

Dependency scheduling's core question — "what can run in parallel, and
in what order?" — is the level assignment: level(v) = length of the
longest path from any source to v.  All nodes of one level are mutually
independent given the earlier levels, so the level IS the parallel
execution wave (build systems, DAG schedulers, feature-pipeline
ordering).

Kahn's algorithm distributes naturally: each round, the current
sources (in-degree 0 within the SURVIVING subgraph) take the next
level and their edges leave the graph — one aggregation + two
anti/semi joins per round over a shrinking edge set, the same
shrinking-active-set posture as k-core peeling.  Rounds = DAG depth
(typically tens).  A cycle means some nodes are never peeled: the
operator RAISES rather than returning a partial layering (feed it the
``scc.condensation`` of a cyclic graph first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.iteration import truncate_lineage


def topological_levels(
    df: DataFrame,
    src: str = "from",
    dst: str = "to",
    *,
    max_rounds: int = 200,
) -> DataFrame:
    """Level assignment -> ``(node, level)`` for every node of the DAG
    (level 0 = sources; level(v) = longest-path depth from a source).
    Null endpoints drop the edge; self-loops raise (a self-loop is a
    cycle).  Raises ``ValueError`` if a cycle survives ``max_rounds``
    or prevents full peeling.
    """
    s = F.col(src).cast("string")
    d = F.col(dst).cast("string")
    edges = (
        df.where(s.isNotNull() & d.isNotNull())
        .select(s.alias("u"), d.alias("v"))
        .distinct()
    )
    edges = truncate_lineage(edges)
    nodes = truncate_lineage(
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
    )
    remaining_nodes = nodes
    remaining_edges = edges
    levels = None
    spark = df.sparkSession
    for lvl in range(max_rounds):
        n_left = remaining_nodes.count()
        if n_left == 0:
            break
        # sources of the surviving subgraph: nodes with no incoming edge
        sources = truncate_lineage(
            remaining_nodes.join(
                remaining_edges.select(F.col("v").alias("node")).distinct(),
                "node",
                "left_anti",
            )
        )
        if sources.isEmpty():
            raise ValueError(
                f"cycle detected: {n_left} nodes remain with no source at "
                f"level {lvl} (run scc.condensation first)"
            )
        tagged = sources.select("node", F.lit(lvl).alias("level"))
        levels = tagged if levels is None else levels.unionAll(tagged)
        remaining_nodes = truncate_lineage(
            remaining_nodes.join(sources, "node", "left_anti")
        )
        remaining_edges = truncate_lineage(
            remaining_edges.join(
                sources.select(F.col("node").alias("u")), "u", "left_anti"
            )
        )
    else:
        raise ValueError(f"DAG depth exceeds max_rounds={max_rounds}")
    if levels is None:
        return spark.createDataFrame([], "node string, level int")
    return levels.select("node", F.col("level").cast("int").alias("level"))


def topological_levels_sql(edge_sql: str) -> str:
    """DuckDB oracle for :func:`topological_levels` — longest-path depth
    via a recursive CTE (equivalent to peeling order on a DAG)."""
    return f"""
WITH RECURSIVE raw AS ({edge_sql}),
e AS (
  SELECT DISTINCT CAST(src AS VARCHAR) AS u, CAST(dst AS VARCHAR) AS v
  FROM raw WHERE src IS NOT NULL AND dst IS NOT NULL
),
nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
paths AS (
  SELECT node, 0 AS depth FROM nodes
  WHERE node NOT IN (SELECT v FROM e)
  UNION
  SELECT e.v AS node, p.depth + 1 AS depth
  FROM paths p JOIN e ON e.u = p.node
)
SELECT node, CAST(max(depth) AS INT) AS level FROM paths GROUP BY node
"""


def redundant_edges_2hop(
    df: DataFrame, src: str = "from", dst: str = "to"
) -> DataFrame:
    """Two-hop redundancy detection -> ``(src, dst, via_count)`` for
    every DIRECT edge that is short-circuited by some 2-path (∃w:
    src→w→dst) — the lineage/dependency-graph cleanup: a direct edge
    that duplicates a transitive path adds scheduling constraints
    without information.  (Exact transitive reduction needs full
    reachability; the 2-hop form is the standard one-join
    approximation and is exact for redundancy introduced by collapsing
    one intermediate — the common case in generated DAGs.)

    One wedge self-join on the shared middle node, inner-joined back to
    the edge set — the triangle counter's bounded shape on a directed
    graph; via_count says how many distinct middles witness the
    redundancy."""
    s = F.col(src).cast("string")
    d = F.col(dst).cast("string")
    edges = truncate_lineage(
        df.where(s.isNotNull() & d.isNotNull() & (s != d))
        .select(s.alias("u"), d.alias("v"))
        .distinct()
    )
    hop1 = edges.select(F.col("u").alias("a"), F.col("v").alias("w"))
    hop2 = edges.select(F.col("u").alias("w"), F.col("v").alias("b"))
    two = (
        hop1.join(hop2, "w")
        .where(F.col("a") != F.col("b"))
        .groupBy(F.col("a").alias("u"), F.col("b").alias("v"))
        .agg(F.count(F.lit(1)).alias("via_count"))
    )
    return edges.join(two, ["u", "v"]).select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "via_count"
    )


def redundant_edges_2hop_sql(edge_sql: str) -> str:
    """DuckDB oracle for :func:`redundant_edges_2hop`."""
    return f"""
WITH raw AS ({edge_sql}),
e AS (
  SELECT DISTINCT CAST(src AS VARCHAR) AS u, CAST(dst AS VARCHAR) AS v
  FROM raw WHERE src IS NOT NULL AND dst IS NOT NULL
    AND CAST(src AS VARCHAR) <> CAST(dst AS VARCHAR)
),
two AS (
  SELECT h1.u, h2.v, count(*) AS via_count
  FROM e h1 JOIN e h2 ON h1.v = h2.u
  WHERE h1.u <> h2.v
  GROUP BY h1.u, h2.v
)
SELECT e.u AS src, e.v AS dst, two.via_count
FROM e JOIN two ON two.u = e.u AND two.v = e.v
"""
