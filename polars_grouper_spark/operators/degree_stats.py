"""Degree distribution and power-law exponent estimation.

The first thing to compute about any production graph: the degree
histogram decides every downstream strategy — broadcast vs shuffle
joins, wedge-order for triangles, hub caps for link prediction,
salting for CC.  The power-law exponent α (via the
Clauset-Shalizi-Newman continuous MLE,
``α = 1 + n / Σ ln(dᵢ / (d_min − ½))``) summarizes the tail in one
number: α ≈ 2 means hubs own the graph (salt everything), α ≥ 3 means
the tail is mild.

Scale notes: the histogram is two map-side-combinable aggregations
(node degrees, then degree counts) — the second input is |V| rows, its
output ≤ max-degree rows.  The α sum is computed over the HISTOGRAM
(Σ n_d · ln d terms, one per distinct degree — typically hundreds),
not per node: floats are summed over few terms, so the round-6 result
is engine-stable where a per-node Σ ln over 10⁹ rows would drift in
the last ulps across aggregation orders.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_grouper_spark.plans.parallelism import local_result


def _degrees(df: DataFrame, src: str, dst: str, directed: bool) -> DataFrame:
    from ..plans.iteration import truncate_lineage

    s = F.col(src).cast("string")
    d = F.col(dst).cast("string")
    # Referenced once or twice (both endpoints in undirected mode) —
    # checkpoint so the dedup isn't recomputed per endpoint branch.
    edges = truncate_lineage(
        df.where(s.isNotNull() & d.isNotNull() & (s != d))
        .select(s.alias("u"), d.alias("v"))
        .distinct()
    )
    ends = edges.select(F.col("u").alias("node"))
    if not directed:
        ends = ends.unionAll(edges.select(F.col("v").alias("node")))
    return ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))


def degree_distribution(
    df: DataFrame, src: str = "from", dst: str = "to", *, directed: bool = False
) -> DataFrame:
    """Degree histogram -> ``(degree, n_nodes)`` (undirected by default:
    each edge counts at both endpoints; ``directed=True`` counts
    OUT-degree).  Self-loops and duplicate edges are dropped first."""
    return (
        _degrees(df, src, dst, directed)
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def powerlaw_alpha(
    df: DataFrame,
    src: str = "from",
    dst: str = "to",
    *,
    directed: bool = False,
    d_min: int = 1,
) -> DataFrame:
    """Power-law tail MLE over nodes with degree >= ``d_min`` -> one row
    ``(n_nodes, n_tail, max_degree, alpha)`` with
    ``alpha = 1 + n_tail / Σ n_d·ln(d/(d_min−½))`` rounded to 6."""
    if d_min < 1:
        raise ValueError(f"d_min must be >= 1, got {d_min}")
    hist = degree_distribution(df, src, dst, directed=directed)
    tail = F.when(F.col("degree") >= d_min, F.col("n_nodes")).otherwise(0)
    log_term = F.when(
        F.col("degree") >= d_min,
        F.col("n_nodes") * F.log(F.col("degree") / F.lit(d_min - 0.5)),
    ).otherwise(F.lit(0.0))
    return hist.agg(
        F.sum("n_nodes").alias("n_nodes"),
        F.sum(tail).alias("n_tail"),
        F.max("degree").alias("max_degree"),
        F.round(
            F.lit(1.0) + F.sum(tail) / F.sum(log_term), 6
        ).alias("alpha"),
    )


def degree_distribution_sql(
    edge_sql: str, *, directed: bool = False
) -> str:
    """DuckDB oracle for :func:`degree_distribution`."""
    mirror = "" if directed else " UNION ALL SELECT v FROM e"
    return f"""
WITH raw AS ({edge_sql}),
e AS (
  SELECT DISTINCT CAST(src AS VARCHAR) AS u, CAST(dst AS VARCHAR) AS v
  FROM raw WHERE src IS NOT NULL AND dst IS NOT NULL
    AND CAST(src AS VARCHAR) <> CAST(dst AS VARCHAR)
),
deg AS (
  SELECT node, count(*)::BIGINT AS degree FROM (
    SELECT u AS node FROM e{mirror}
  ) GROUP BY node
)
SELECT degree, count(*)::BIGINT AS n_nodes FROM deg GROUP BY degree
"""


def powerlaw_alpha_sql(
    edge_sql: str, *, directed: bool = False, d_min: int = 1
) -> str:
    """DuckDB oracle for :func:`powerlaw_alpha`."""
    hist = degree_distribution_sql(edge_sql, directed=directed)
    return f"""
WITH hist AS ({hist})
SELECT sum(n_nodes)::BIGINT AS n_nodes,
       sum(CASE WHEN degree >= {d_min} THEN n_nodes ELSE 0 END)::BIGINT
         AS n_tail,
       max(degree) AS max_degree,
       round(1.0 + sum(CASE WHEN degree >= {d_min} THEN n_nodes ELSE 0 END)
             / sum(CASE WHEN degree >= {d_min}
                        THEN n_nodes * ln(degree / {d_min - 0.5!r})
                        ELSE 0.0 END), 6) AS alpha
FROM hist
"""


def powerlaw_alpha_exact(degrees: "list[int]", d_min: int = 1) -> float:
    """In-memory CSN estimator for tests: the same formula over a
    Python list."""
    tail = [d for d in degrees if d >= d_min]
    return 1.0 + len(tail) / sum(math.log(d / (d_min - 0.5)) for d in tail)


def reciprocity(df: DataFrame, src: str, dst: str) -> DataFrame:
    """Directed-graph reciprocity -> one row ``(n_edges, n_reciprocal,
    reciprocity)``: the fraction of distinct directed edges whose
    reverse also exists (self-loops excluded) — the one-number "is this
    interaction graph mutual or broadcast-shaped?" diagnostic that
    separates follower graphs (~0.2) from messenger graphs (~0.7).

    One distinct + one self-equality-join on the reversed key — the
    reverse lookup is an equality join, never a cartesian; both sides
    reduce to distinct edges map-side first.
    """
    edges = (
        df.select(
            F.col(src).cast("string").alias("s"),
            F.col(dst).cast("string").alias("d"),
        )
        .where(F.col("s") != F.col("d"))
        .distinct()
    )
    rev = edges.select(
        F.col("d").alias("s"), F.col("s").alias("d")
    )
    recip = edges.join(rev, ["s", "d"], "left_semi")
    return edges.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        recip.agg(F.count(F.lit(1)).alias("n_reciprocal"))
    ).select(
        "n_edges",
        "n_reciprocal",
        (F.col("n_reciprocal") / F.col("n_edges").cast("double")).alias(
            "reciprocity"
        ),
    )


def reciprocity_sql(rel_sql: str, src_expr: str, dst_expr: str) -> str:
    """DuckDB oracle for :func:`reciprocity`."""
    return f"""
WITH edges AS (
  SELECT DISTINCT CAST({src_expr} AS VARCHAR) AS s,
         CAST({dst_expr} AS VARCHAR) AS d
  FROM ({rel_sql})
  WHERE CAST({src_expr} AS VARCHAR) <> CAST({dst_expr} AS VARCHAR)
)
SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
       COUNT(*) AS n_reciprocal,
       COUNT(*) / CAST((SELECT COUNT(*) FROM edges) AS DOUBLE)
         AS reciprocity
FROM edges e WHERE EXISTS (
  SELECT 1 FROM edges r WHERE r.s = e.d AND r.d = e.s)
"""


def rich_club(
    df: DataFrame,
    src: str = "from",
    dst: str = "to",
    *,
    ks: "tuple[int, ...]" = (4, 8, 16, 32, 64),
) -> DataFrame:
    """Rich-club coefficients -> ``(k, n_nodes, n_edges, phi)`` per
    degree threshold: among nodes with degree > k, what fraction of
    possible edges exists?  phi(k) rising toward 1 means the hubs form
    a club (core-periphery); flat phi means hub links are incidental.

    One degree aggregation joined back to the canonical edge list (so
    every edge carries both endpoint degrees), then ALL thresholds
    evaluate in a single conditional-sum pass — one scan of edges and
    one of degrees regardless of len(ks); phi divides exact integers in
    double at the end."""
    if not ks or any(k < 1 for k in ks):
        raise ValueError(f"ks must be non-empty positive thresholds: {ks}")
    s = F.col(src).cast("string")
    d = F.col(dst).cast("string")
    edges = (
        df.where(s.isNotNull() & d.isNotNull() & (s != d))
        .select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .distinct()
    )
    from ..plans.iteration import truncate_lineage

    edges = truncate_lineage(edges)
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    deg = truncate_lineage(deg)
    ed = edges.join(
        deg.select(F.col("node").alias("a"), F.col("degree").alias("_da")),
        "a",
    ).join(
        deg.select(F.col("node").alias("b"), F.col("degree").alias("_db")),
        "b",
    )
    e_aggs = [
        F.sum(
            ((F.col("_da") > k) & (F.col("_db") > k)).cast("long")
        ).alias(f"_e{k}")
        for k in ks
    ]
    n_aggs = [
        F.sum((F.col("degree") > k).cast("long")).alias(f"_n{k}")
        for k in ks
    ]
    e_row = ed.agg(*e_aggs)
    n_row = deg.agg(*n_aggs)
    both = e_row.crossJoin(n_row)
    spark = df.sparkSession
    k_df = local_result(spark, [(int(k),) for k in ks], "k int")
    out = k_df.crossJoin(F.broadcast(both))
    pick_e = F.coalesce(
        *[F.when(F.col("k") == k, F.col(f"_e{k}")) for k in ks]
    )
    pick_n = F.coalesce(
        *[F.when(F.col("k") == k, F.col(f"_n{k}")) for k in ks]
    )
    phi = F.when(
        pick_n >= 2,
        (F.lit(2.0) * pick_e) / (pick_n.cast("double") * (pick_n - F.lit(1))),
    )
    return out.select(
        "k",
        pick_n.alias("n_nodes"),
        pick_e.alias("n_edges"),
        phi.alias("phi"),
    ).orderBy("k")


def rich_club_sql(
    edge_sql: str, *, ks: "tuple[int, ...]" = (4, 8, 16, 32, 64)
) -> str:
    """DuckDB oracle for :func:`rich_club`."""
    k_rows = ", ".join(f"({int(k)})" for k in ks)
    return f"""
WITH raw AS ({edge_sql}),
e AS (
  SELECT DISTINCT least(CAST(src AS VARCHAR), CAST(dst AS VARCHAR)) AS a,
         greatest(CAST(src AS VARCHAR), CAST(dst AS VARCHAR)) AS b
  FROM raw WHERE src IS NOT NULL AND dst IS NOT NULL
    AND CAST(src AS VARCHAR) <> CAST(dst AS VARCHAR)
),
deg AS (
  SELECT node, count(*)::BIGINT AS degree FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e
  ) GROUP BY node
),
ed AS (
  SELECT da.degree AS dega, db.degree AS degb
  FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
),
ks(k) AS (VALUES {k_rows})
SELECT k,
       (SELECT count(*) FROM deg WHERE degree > k)::BIGINT AS n_nodes,
       (SELECT count(*) FROM ed WHERE dega > k AND degb > k)::BIGINT AS n_edges,
       CASE WHEN (SELECT count(*) FROM deg WHERE degree > k) >= 2 THEN
         (2.0 * (SELECT count(*) FROM ed WHERE dega > k AND degb > k))
         / (CAST((SELECT count(*) FROM deg WHERE degree > k) AS DOUBLE)
            * ((SELECT count(*) FROM deg WHERE degree > k) - 1))
       END AS phi
FROM ks ORDER BY k
"""
