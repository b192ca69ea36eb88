"""Link prediction — beyond-reference graph operator.

Neighborhood-overlap scores for *non-adjacent* node pairs of an
undirected edge-list graph: common-neighbor count, Jaccard coefficient,
and Adamic–Adar (Adamic & Adar 2003, "Friends and neighbors on the
Web") — the classic unsupervised link-prediction features
(Liben-Nowell & Kleinberg 2007).

Input follows the reference's edge-list convention (SURVEY.md §1.1:
``from``/``to`` columns of any dtype, coerced to string; null endpoints
and self-loops dropped; parallel edges collapsed — neighborhood overlap
is a set notion).

Algorithm (all joins/aggregations on interned 64-bit ids, nothing
driver-sized):

1. Intern node names to ``xxhash64`` longs; build the distinct
   undirected edge set and the symmetric adjacency ``(center, nbr)``.
2. Candidate pairs are *wedges*: for each center ``w``, every unordered
   pair of distinct neighbors ``(x, y)``.  A pair's wedge count IS its
   common-neighbor count, and summing ``1 / ln(deg(w))`` over its wedge
   centers IS Adamic–Adar, so one ``groupBy(x, y)`` produces both.
3. Drop pairs that are already edges (left-anti join on the canonical
   ``a < b`` edge table), attach endpoint degrees, and derive
   ``jaccard = cn / (deg_x + deg_y - cn)``.

Scale: wedge generation emits ``sum(deg(w) * (deg(w) - 1) / 2)`` rows —
quadratic in hub degree.  Unlike triangle counting, degree orientation
cannot bound this (every common neighbor must be enumerated), so the
escape hatch for power-law graphs is ``max_center_degree``: wedge
centers above the cap are skipped (documented approximation — a hub
shared by half the graph contributes only ``1/ln(deg)`` ≈ 0 signal per
pair anyway, which is exactly the intuition behind Adamic–Adar's
weighting).  Everything else is linear-in-E hash shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.iteration import truncate_lineage
from .triangles import _interned_edges


def link_scores(
    df: DataFrame,
    src: str = "from",
    dst: str = "to",
    *,
    max_center_degree: int | None = None,
    max_broadcast_edges: int = 2_000_000,
) -> DataFrame:
    """Score non-adjacent node pairs by neighborhood overlap.

    Returns ``(node_a, node_b, common_neighbors, jaccard, adamic_adar)``
    with ``node_a < node_b`` in string order; only pairs with at least
    one common neighbor appear (pairs with zero overlap score 0 on every
    metric and would be |V|² of the output).

    ``max_center_degree``: skip wedge centers with more than this many
    neighbors (hub cap for power-law graphs; ``None`` = exact).

    ``max_broadcast_edges``: the betweenness-style broadcast guard.  The
    wedge-scored pair table is the data-sized output (orders of magnitude
    larger than V or E), yet it must be joined against the edge set
    (anti), the degree table (twice) and the name map (twice) — five
    shuffles + sorts of the big side if those run as sort-merge joins.
    When the deduplicated edge count fits the guard, the V- and E-sized
    tables are localCheckpointed once (deg/names were otherwise
    recomputed per consumer) and broadcast-hinted, so the scored table
    never shuffles after its aggregation (measured 8.4 -> 5.2 s on the
    132k-edge sf0.1 part graph).  Above the guard everything stays
    sort-merge + AQE — the 100 TB path is unchanged.

    >>> edges = spark.createDataFrame(
    ...     [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")], ["from", "to"])
    >>> link_scores(edges).orderBy("node_a", "node_b").show()
    +------+------+----------------+-------+------------------+
    |node_a|node_b|common_neighbors|jaccard|       adamic_adar|
    +------+------+----------------+-------+------------------+
    |     a|     d|               1|    0.5|0.9102392266268375|
    |     b|     d|               1|    0.5|0.9102392266268375|
    +------+------+----------------+-------+------------------+
    <BLANKLINE>
    """
    edges, names = _interned_edges(df, src, dst)

    # Broadcast guard: _interned_edges already returns an EAGERLY
    # checkpointed edge frame, so count it directly — no extra
    # localCheckpoint wrap (r8 ADVICE: the above-guard path must pay
    # only this one count over materialized rows, keeping the
    # "100 TB path unchanged" claim honest).
    small = False
    if max_broadcast_edges:
        small = edges.count() <= max_broadcast_edges

    # Symmetric adjacency and per-node degree (distinct-neighbor count).
    adj = edges.select(F.col("a").alias("w"), F.col("b").alias("n")).unionAll(
        edges.select(F.col("b").alias("w"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("deg"))
    anti_edges = edges
    if small:
        # V <= 2E, so deg/names are guard-bounded too.  Checkpoint deg
        # once (three consumers below would each recompute the union +
        # aggregation) and broadcast every small side.
        deg = F.broadcast(truncate_lineage(deg, cache=False))
        names = F.broadcast(truncate_lineage(names, cache=False))
        anti_edges = F.broadcast(edges)

    centers = deg
    if max_center_degree is not None:
        centers = deg.where(F.col("deg") <= max_center_degree)
    # 1/ln(deg(w)) is well-defined: a wedge center has >= 2 neighbors.
    centers = centers.where(F.col("deg") >= 2).select(
        "w", (F.lit(1.0) / F.log(F.col("deg").cast("double"))).alias("aa_term")
    )

    wedge_src = adj.join(centers, "w")
    # Explicitly size and SHARE the wedge join's exchange (r10): AQE
    # coalesces the shuffle read by its ~MB of input bytes, but the work
    # downstream is quadratic in center degree (the wedge explosion) —
    # profiled as one 2.1 s stage on 7 tasks at 32 cores.  A keyed
    # repartition at session width feeds BOTH join aliases from one
    # exchange (the second side is a ReusedExchange, so this is the same
    # single shuffle the join needed anyway, now explicitly wide).
    from ..plans.parallelism import session_parallelism

    wedge_src = wedge_src.repartition(
        session_parallelism(df.sparkSession), "w"
    )
    e1 = wedge_src.select("w", "aa_term", F.col("n").alias("x"))
    e2 = wedge_src.select("w", F.col("n").alias("y"))
    wedges = e1.join(e2, "w").where(F.col("x") < F.col("y"))

    scored = wedges.groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("cn"), F.sum("aa_term").alias("aa")
    )

    # Remove pairs that are already edges; (x, y) is long-order canonical,
    # matching the edge table's a < b convention.
    non_adjacent = scored.join(
        anti_edges,
        (F.col("x") == F.col("a")) & (F.col("y") == F.col("b")),
        "left_anti",
    )

    dx = deg.select(F.col("w").alias("x"), F.col("deg").alias("deg_x"))
    dy = deg.select(F.col("w").alias("y"), F.col("deg").alias("deg_y"))
    with_deg = non_adjacent.join(dx, "x").join(dy, "y")

    nx = names.select(F.col("id").alias("x"), F.col("node").alias("name_x"))
    ny = names.select(F.col("id").alias("y"), F.col("node").alias("name_y"))
    return (
        with_deg.join(nx, "x")
        .join(ny, "y")
        .select(
            F.least("name_x", "name_y").alias("node_a"),
            F.greatest("name_x", "name_y").alias("node_b"),
            F.col("cn").alias("common_neighbors"),
            (
                F.col("cn").cast("double")
                / (F.col("deg_x") + F.col("deg_y") - F.col("cn")).cast("double")
            ).alias("jaccard"),
            F.col("aa").alias("adamic_adar"),
        )
    )


def link_scores_sql(edge_sql: str, max_center_degree: int | None = None) -> str:
    """DuckDB oracle replicating :func:`link_scores` over an edge subquery
    producing columns ``(src, dst)``.  Works on the string names directly
    (scores are invariant to the interning); the wedge pair is
    canonicalized on names, which matches Spark's output columns after
    its least/greatest projection."""
    center_cap = (
        "" if max_center_degree is None else f"AND d.deg <= {int(max_center_degree)}"
    )
    return f"""
WITH raw AS ({edge_sql}),
e AS (
  SELECT DISTINCT least(CAST(src AS VARCHAR), CAST(dst AS VARCHAR)) AS a,
                  greatest(CAST(src AS VARCHAR), CAST(dst AS VARCHAR)) AS b
  FROM raw
  WHERE src IS NOT NULL AND dst IS NOT NULL
    AND CAST(src AS VARCHAR) <> CAST(dst AS VARCHAR)
),
adj AS (
  SELECT a AS w, b AS n FROM e UNION ALL SELECT b, a FROM e
),
deg AS (SELECT w, count(*)::BIGINT AS deg FROM adj GROUP BY w),
wedge AS (
  SELECT least(a1.n, a2.n) AS x, greatest(a1.n, a2.n) AS y,
         1.0 / ln(d.deg) AS aa_term
  FROM adj a1
  JOIN adj a2 ON a1.w = a2.w AND a1.n < a2.n
  JOIN deg d ON d.w = a1.w
  WHERE d.deg >= 2 {center_cap}
),
scored AS (
  SELECT x, y, count(*)::BIGINT AS cn, sum(aa_term) AS aa
  FROM wedge GROUP BY x, y
),
non_adj AS (
  SELECT s.* FROM scored s
  ANTI JOIN e ON e.a = s.x AND e.b = s.y
)
SELECT s.x AS node_a, s.y AS node_b, s.cn AS common_neighbors,
       s.cn / (dx.deg + dy.deg - s.cn)::DOUBLE AS jaccard,
       s.aa AS adamic_adar
FROM non_adj s
JOIN deg dx ON dx.w = s.x
JOIN deg dy ON dy.w = s.y
"""


def project_bipartite(
    df: DataFrame,
    anchor: str,
    item: str,
    *,
    max_anchor_degree: int | None = None,
) -> DataFrame:
    """Weighted one-mode projection of a bipartite edge list ->
    ``(item_a, item_b, weight)``: items sharing an anchor (order, user,
    document, ...) become connected, weighted by the number of shared
    DISTINCT anchors; ``item_a < item_b`` in string order.

    The co-occurrence builder behind market-basket graphs, co-purchase
    networks, and the part graph used by this repo's own triangle/k-core
    queries — exposed as a first-class operator.

    Scale is the wedge story again (Σ deg(anchor)² pair rows before the
    count combines them): ``max_anchor_degree`` skips mega-anchors — an
    order/user touching thousands of items creates quadratic pair fanout
    and near-zero-signal edges (the same argument as link_scores' hub
    cap).  One distinct + one self-join + one map-side-combinable count.
    """
    return _project_from_pairs(
        _distinct_anchor_item(df, anchor, item), max_anchor_degree
    )


def _distinct_anchor_item(df: DataFrame, anchor: str, item: str) -> DataFrame:
    """Checkpointed distinct (anchor, item) table — shared by the
    projection and any consumer needing per-item anchor totals
    (item_cosine_pairs), so the raw rows are scanned and deduped ONCE."""
    a = F.col(anchor).cast("string")
    it = F.col(item).cast("string")
    return truncate_lineage(
        df.where(a.isNotNull() & it.isNotNull())
        .select(a.alias("anchor"), it.alias("item"))
        .distinct()
    )


def _project_from_pairs(
    pairs: DataFrame, max_anchor_degree: int | None
) -> DataFrame:
    """Projection body of :func:`project_bipartite` over an already
    checkpointed distinct pair table."""
    if max_anchor_degree is not None:
        keep = (
            pairs.groupBy("anchor")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") <= max_anchor_degree)
            .select("anchor")
        )
        pairs = pairs.join(keep, "anchor", "left_semi")
    x = pairs.select("anchor", F.col("item").alias("item_a"))
    y = pairs.select("anchor", F.col("item").alias("item_b"))
    return (
        x.join(y, "anchor")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )


def project_bipartite_sql(
    pair_sql: str, max_anchor_degree: int | None = None
) -> str:
    """DuckDB oracle replicating :func:`project_bipartite`; ``pair_sql``
    yields ``(anchor, item)``."""
    cap = (
        ""
        if max_anchor_degree is None
        else f"""
, keep AS (
  SELECT anchor FROM pairs GROUP BY anchor
  HAVING count(*) <= {int(max_anchor_degree)}
), pairs2 AS (SELECT p.* FROM pairs p SEMI JOIN keep k ON k.anchor = p.anchor)
"""
    )
    src = "pairs2" if max_anchor_degree is not None else "pairs"
    return f"""
WITH raw AS ({pair_sql}),
pairs AS (
  SELECT DISTINCT CAST(anchor AS VARCHAR) AS anchor,
                  CAST(item AS VARCHAR) AS item
  FROM raw WHERE anchor IS NOT NULL AND item IS NOT NULL
){cap}
SELECT x.item AS item_a, y.item AS item_b, count(*)::BIGINT AS weight
FROM {src} x JOIN {src} y ON x.anchor = y.anchor AND x.item < y.item
GROUP BY 1, 2
"""


def item_cosine_pairs(
    df: DataFrame,
    anchor_col: str,
    item_col: str,
    *,
    max_anchor_degree: int | None = None,
    min_cooccur: int = 1,
) -> DataFrame:
    """Item-item cosine similarity over co-occurrence counts ->
    ``(item_a, item_b, n_co, n_a, n_b, cosine)`` with ``cosine =
    n_co / sqrt(n_a * n_b)`` — the classic item-based collaborative-
    filtering score (binary interaction vectors), normalizing
    :func:`project_bipartite`'s raw co-counts so blockbuster items
    stop dominating every neighbor list.

    Exactness: counts are integers; ``sqrt`` of the exact product and
    one division are the only float ops (identical IEEE both engines).
    Scale posture inherits the projection: distinct (anchor, item)
    first, anchors capped by ``max_anchor_degree`` (a power-law anchor
    generates degree² pairs), item totals joined back as broadcast
    metadata.
    """
    # One distinct pass serves both the projection and the totals
    # (r9-opt): the old shape deduped the raw rows twice — once inside
    # project_bipartite and once for the per-item anchor counts.
    pairs_tbl = _distinct_anchor_item(df, anchor_col, item_col)
    pairs = _project_from_pairs(pairs_tbl, max_anchor_degree).where(
        F.col("weight") >= min_cooccur
    )
    totals = pairs_tbl.groupBy("item").agg(F.count(F.lit(1)).alias("_n"))
    na = totals.select(
        F.col("item").alias("item_a"), F.col("_n").alias("n_a")
    )
    nb = totals.select(
        F.col("item").alias("item_b"), F.col("_n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .select(
            "item_a",
            "item_b",
            F.col("weight").alias("n_co"),
            "n_a",
            "n_b",
            (
                F.col("weight")
                / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double"))
            ).alias("cosine"),
        )
    )


def item_cosine_pairs_sql(
    rel_sql: str,
    anchor_expr: str,
    item_expr: str,
    *,
    max_anchor_degree: int | None = None,
    min_cooccur: int = 1,
) -> str:
    """DuckDB oracle for :func:`item_cosine_pairs` (same projection +
    broadcast totals)."""
    pair_sql = (
        f"SELECT {anchor_expr} AS anchor, {item_expr} AS item "
        f"FROM ({rel_sql})"
    )
    proj = project_bipartite_sql(pair_sql, max_anchor_degree)
    return f"""
WITH pairs AS ({proj}),
totals AS (
  SELECT item, COUNT(*) AS n FROM (
    SELECT DISTINCT CAST({anchor_expr} AS VARCHAR) AS a,
           CAST({item_expr} AS VARCHAR) AS item
    FROM ({rel_sql})
  ) GROUP BY item
)
SELECT p.item_a, p.item_b, p.weight AS n_co, ta.n AS n_a, tb.n AS n_b,
       p.weight / SQRT(CAST(ta.n * tb.n AS DOUBLE)) AS cosine
FROM pairs p JOIN totals ta ON ta.item = p.item_a
             JOIN totals tb ON tb.item = p.item_b
WHERE p.weight >= {min_cooccur}
"""
