"""FastRP node embeddings: iterated very-sparse random projection.

Chen et al. 2019 ("Fast and Accurate Network Embeddings via Very Sparse
Random Projection"): project the adjacency's r-step transition structure
through ONE shared sparse random matrix — embedding(v) aggregates the
random signatures of v's 1-hop and 2-hop neighborhoods.  Equivalent
quality to DeepWalk/node2vec on most tasks at a tiny fraction of the
cost, and — the reason Neo4j GDS ships it as the default billion-edge
embedder — expressible entirely as equality joins + grouped sums: no
sampling, no SGD, no parameter server.

This implementation keeps every value an INTEGER so the result is
bit-exact under any aggregation order (the same trick as the HITS and
centroid operators): the projection matrix entries are {-1, 0, +1}
drawn by portable hash with P(±1) = 1/s each (Achlioptas/Li sparse
projection with the 1/sqrt(s) scale factor deferred — scaling is a
per-column constant that downstream cosine/dot consumers cancel or
apply once), and neighborhood aggregation is an UNNORMALIZED sum
(A·R and A·A·R).  Degree normalization and per-level L2 norms are
float-domain post-processing a consumer applies after the fact;
deferring them keeps the distributed part exact, deterministic and
oracle-verifiable.

Plan shape: the projection is generated on the fly from (node, dim)
hashes — never stored, never a driver artifact; level 1 is one
edges ⋈ projection join + grouped sum; level 2 is one edges ⋈ level-1
join + grouped sum.  Sparse rows (node, dim, val) throughout; zero
entries of R are never materialized (~(s-2)/s of them at s=3).
Overflow bound: |level2| <= max_degree² · dim-density — at 2^63 this
tolerates max_degree ~3·10⁹ before the ANSI overflow guard trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql
from ..plans.iteration import truncate_lineage


def fastrp_embedding(
    df: DataFrame,
    src: str = "from",
    dst: str = "to",
    *,
    dim: int = 16,
    sparsity: int = 3,
    weights: "tuple[int, int]" = (1, 1),
    directed: bool = False,
    portable: bool = True,
) -> DataFrame:
    """Two-level FastRP -> sparse ``(node, dim, val)`` rows where
    ``val = w1·(A·R)[node, dim] + w2·(A²·R)[node, dim]`` (exact bigint;
    zero rows are kept when a level contributes — absent (node, dim)
    pairs are implicit zeros).

    ``sparsity`` is Li et al.'s s: P(R=+1) = P(R=-1) = 1/(2·ceil(s/... )
    — here drawn as hash % (2·s) ∈ {0 → +1, 1 → -1, else 0}, so the
    expected nonzero density per node is dim/s.
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    if sparsity < 1:
        raise ValueError(f"sparsity must be >= 1, got {sparsity}")
    w1, w2 = weights
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

    nodes = edges.select(F.col("u").alias("node")).distinct()
    dims = edges.sparkSession.range(dim).select(F.col("id").cast("int").alias("dim"))
    h = portable_hash64(
        F.concat(F.col("node"), F.lit("#"), F.col("dim").cast("string")),
        portable=portable,
    )
    draw = F.pmod(h, F.lit(2 * sparsity))
    proj = (
        nodes.crossJoin(dims)
        .select(
            "node",
            "dim",
            F.when(draw == 0, F.lit(1))
            .when(draw == 1, F.lit(-1))
            .otherwise(F.lit(0))
            .alias("r"),
        )
        .where(F.col("r") != 0)
    )
    proj = truncate_lineage(proj)

    # level 1: (A·R)[v] = sum of R[u] over edges u -> v
    lvl1 = (
        edges.join(proj.select(F.col("node").alias("u"), "dim", "r"), "u")
        .groupBy(F.col("v").alias("node"), "dim")
        .agg(F.sum("r").cast("long").alias("val"))
    )
    lvl1 = truncate_lineage(lvl1)
    # level 2: (A·lvl1)[v]
    lvl2 = (
        edges.join(lvl1.select(F.col("node").alias("u"), "dim", "val"), "u")
        .groupBy(F.col("v").alias("node"), "dim")
        .agg(F.sum("val").cast("long").alias("val"))
    )
    combined = (
        lvl1.select("node", "dim", (F.lit(w1) * F.col("val")).alias("p"))
        .unionAll(lvl2.select("node", "dim", (F.lit(w2) * F.col("val")).alias("p")))
        .groupBy("node", "dim")
        .agg(F.sum("p").cast("long").alias("val"))
    )
    return combined


def fastrp_embedding_sql(
    edge_sql: str,
    *,
    dim: int = 16,
    sparsity: int = 3,
    weights: "tuple[int, int]" = (1, 1),
    directed: bool = False,
) -> str:
    """DuckDB oracle replaying :func:`fastrp_embedding`."""
    w1, w2 = weights
    h = portable_hash64_sql("(node || '#' || CAST(dim AS VARCHAR))")
    mirror = (
        ""
        if directed
        else " UNION SELECT CAST(dst AS VARCHAR), CAST(src AS VARCHAR) FROM raw "
        "WHERE src IS NOT NULL AND dst IS NOT NULL "
        "AND CAST(src AS VARCHAR) <> CAST(dst AS VARCHAR)"
    )
    return f"""
WITH raw AS ({edge_sql}),
e AS (
  SELECT DISTINCT CAST(src AS VARCHAR) AS u, CAST(dst AS VARCHAR) AS v
  FROM raw WHERE src IS NOT NULL AND dst IS NOT NULL
    AND CAST(src AS VARCHAR) <> CAST(dst AS VARCHAR){mirror}
),
nodes AS (SELECT DISTINCT u AS node FROM e),
proj AS (
  SELECT node, dim, r FROM (
    SELECT node, CAST(range AS INT) AS dim,
           CASE ({h}) % {2 * sparsity}
             WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS r
    FROM nodes CROSS JOIN range({dim})
  ) WHERE r <> 0
),
lvl1 AS (
  SELECT e.v AS node, p.dim, sum(p.r)::BIGINT AS val
  FROM e JOIN proj p ON p.node = e.u
  GROUP BY 1, 2
),
lvl2 AS (
  SELECT e.v AS node, l.dim, sum(l.val)::BIGINT AS val
  FROM e JOIN lvl1 l ON l.node = e.u
  GROUP BY 1, 2
)
SELECT node, dim, sum(p)::BIGINT AS val FROM (
  SELECT node, dim, {w1} * val AS p FROM lvl1
  UNION ALL
  SELECT node, dim, {w2} * val AS p FROM lvl2
) GROUP BY 1, 2
"""
