"""k-truss decomposition (fixed k) — beyond-reference graph operator.

The k-truss of an undirected graph is the maximal subgraph in which every
edge participates in at least k−2 triangles (Cohen 2008) — a stricter
cohesion notion than the k-core (every k-truss is inside a (k−1)-core),
standard for extracting communities that survive hub removal.

Computed by iterative support peeling: count each edge's triangle
support, delete edges below k−2, repeat until stable.  Each round is the
triangle-support pipeline of ``operators.triangles`` restricted to the
surviving edges — wedge generation bounded by the degree orientation
(O(√E) out-degrees), everything joins/aggregations on interned 64-bit
ids, nothing driver-sized.  Like k-core, the edge set only shrinks, so
per-round cost is monotone non-increasing; rounds are bounded by the
peeling depth (``max_iter`` guards adversarial chains of triangles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.iteration import fingerprint, truncate_lineage
from .triangles import _interned_edges


def _edge_support(edges: DataFrame) -> DataFrame:
    """Triangle support per canonical edge -> (a, b, support).

    Degree-ordered wedge enumeration (see triangles.triangle_count);
    every triangle (u, v1, v2) contributes support to its three edges
    {u,v1}, {u,v2}, {v1,v2}.
    """
    deg = (
        edges.select(F.col("a").alias("nid"))
        .unionAll(edges.select(F.col("b").alias("nid")))
        .groupBy("nid")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("nid").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("nid").alias("b"), F.col("deg").alias("deg_b"))
    ranked = edges.join(da, "a").join(db, "b")
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    e1 = oriented.select(F.col("u"), F.col("v").alias("v1"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("v2"))
    wedges = e1.join(e2, "u").where(F.col("v1") < F.col("v2"))
    triangles = wedges.join(
        edges, (F.col("v1") == F.col("a")) & (F.col("v2") == F.col("b"))
    ).select("u", "v1", "v2")
    tri_edges = (
        triangles.select(
            F.least("u", "v1").alias("a"), F.greatest("u", "v1").alias("b")
        )
        .unionAll(
            triangles.select(
                F.least("u", "v2").alias("a"), F.greatest("u", "v2").alias("b")
            )
        )
        .unionAll(triangles.select(F.col("v1").alias("a"), F.col("v2").alias("b")))
    )
    support = tri_edges.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("support")
    )
    return (
        edges.join(support, ["a", "b"], "left")
        .select("a", "b", F.coalesce("support", F.lit(0)).alias("support"))
    )


def k_truss(
    df: DataFrame,
    k: int,
    src: str = "from",
    dst: str = "to",
    max_iter: int = 100,
) -> DataFrame:
    """Edges of the k-truss with their within-truss support ->
    ``(src, dst, support)`` (endpoint names, src < dst in string order);
    empty result if the k-truss is empty.

    >>> edges = spark.createDataFrame(
    ...     [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], ["from", "to"])
    >>> k_truss(edges, 3).orderBy("src", "dst").show()
    +---+---+-------+
    |src|dst|support|
    +---+---+-------+
    |  a|  b|      1|
    |  a|  c|      1|
    |  b|  c|      1|
    +---+---+-------+
    <BLANKLINE>
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    min_support = k - 2
    edges, names = _interned_edges(df, src, dst)
    edges = truncate_lineage(edges, cache=False)
    prev = fingerprint(edges, "a", "b")
    for _ in range(max_iter):
        sup = _edge_support(edges)
        new_edges = sup.where(F.col("support") >= min_support).select("a", "b")
        new_edges = truncate_lineage(new_edges, cache=False)
        cur = fingerprint(new_edges, "a", "b")
        if cur == prev:
            # fixpoint: new_edges == edges, so sup IS the final support
            # table (equal fingerprint count ⇒ nothing was filtered)
            final = sup
            na = names.select(F.col("id").alias("a"), F.col("node").alias("src"))
            nb = names.select(F.col("id").alias("b"), F.col("node").alias("dst"))
            return (
                final.join(na, "a")
                .join(nb, "b")
                .select(
                    F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"),
                    "support",
                )
            )
        edges, prev = new_edges, cur
    raise RuntimeError(
        f"k_truss did not converge within max_iter={max_iter} peeling rounds; "
        "raise max_iter (adversarial triangle chains peel O(E) rounds)"
    )


def k_truss_sql(edge_sql: str, k: int, rounds: int) -> str:
    """DuckDB oracle replicating :func:`k_truss`: ``rounds`` unrolled
    support-peel steps, each MATERIALIZED.  ``rounds`` must be >= the
    fixture's peeling depth; extra rounds are fixpoint no-ops."""
    min_support = k - 2
    support = """(
  SELECT e.a, e.b, coalesce(s.c, 0)::BIGINT AS support
  FROM {e} e LEFT JOIN (
    SELECT a, b, count(*) AS c FROM (
      SELECT e1.a, e1.b FROM {e} e1 JOIN {e} e2 ON e2.a = e1.b
                        JOIN {e} e3 ON e3.a = e1.a AND e3.b = e2.b
      UNION ALL
      SELECT e1.a, e2.b FROM {e} e1 JOIN {e} e2 ON e2.a = e1.b
                        JOIN {e} e3 ON e3.a = e1.a AND e3.b = e2.b
      UNION ALL
      SELECT e2.a, e2.b FROM {e} e1 JOIN {e} e2 ON e2.a = e1.b
                        JOIN {e} e3 ON e3.a = e1.a AND e3.b = e2.b
    ) GROUP BY a, b
  ) s ON s.a = e.a AND s.b = e.b
)"""
    chain = [
        f"""e0 AS MATERIALIZED (
  SELECT DISTINCT least(CAST(src AS VARCHAR), CAST(dst AS VARCHAR)) AS a,
                  greatest(CAST(src AS VARCHAR), CAST(dst AS VARCHAR)) AS b
  FROM ({edge_sql})
  WHERE src IS NOT NULL AND dst IS NOT NULL
    AND CAST(src AS VARCHAR) <> CAST(dst AS VARCHAR)
)"""
    ]
    for i in range(rounds):
        chain.append(
            f"e{i + 1} AS MATERIALIZED (SELECT a, b FROM "
            f"{support.format(e=f'e{i}')} WHERE support >= {min_support})"
        )
    n = rounds
    return (
        "WITH "
        + ",\n".join(chain)
        + f"\nSELECT a AS src, b AS dst, support FROM {support.format(e=f'e{n}')}"
    )
