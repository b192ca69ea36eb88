"""Multi-hop neighbor feature aggregation (GNN-style message passing).

Feature pipelines for graph learning (GraphSAGE — Hamilton et al. 2017;
GCN — Kipf & Welling 2017) need, per node, aggregates of its neighbors'
features at hop 1, 2, ... k.  The naive formulation enumerates paths
(``edges JOIN edges JOIN features`` for hop 2 — Σdeg² intermediates);
this operator instead PROPAGATES aggregated state hop by hop:

    sum_0(v)   = feat(v)              cnt_0(v)   = 1
    sum_k(u)   = Σ_{(u,v)∈E} sum_{k-1}(v)
    cnt_k(u)   = Σ_{(u,v)∈E} cnt_{k-1}(v)

so EVERY hop is exactly one equality join of the edge list against the
previous hop's per-node state (O(E) rows shuffled, map-side-combinable
aggregation) — no path materialization, no quadratic blowup, the
100 TB-safe shape.  ``cnt`` counts paths, so ``mean = sum / cnt`` is the
path-weighted neighbor mean — the same convention as unnormalized GCN
message passing (a neighbor reachable along two length-2 paths counts
twice).

Reference surface: none (beyond-reference operator, SURVEY.md §2
extension list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.iteration import truncate_lineage

_BROADCAST_STATE_ROWS = 5_000_000


def _estimate_small(features: DataFrame) -> bool:
    """One count over the feature table (<= one row per node) decides the
    broadcast-vs-shuffle join strategy for the whole loop."""
    return features.count() <= _BROADCAST_STATE_ROWS


def neighbor_agg(
    edges: DataFrame,
    features: DataFrame,
    src: str = "from",
    dst: str = "to",
    id_col: str = "node",
    feat_col: str = "feat",
    *,
    hops: int = 2,
    directed: bool = True,
) -> DataFrame:
    """Per-node neighbor-feature aggregates for hops 1..``hops`` ->
    ``(node, hop, n_paths, feat_sum, feat_mean)`` (floats rounded to 6).

    ``edges``: (src, dst) pairs — messages flow AGAINST edge direction
    (a node aggregates the features of the nodes it points TO), matching
    the "aggregate my out-neighborhood" reading; pass ``directed=False``
    to mirror the edge list first.  ``features``: (id, feat) with one
    row per node; nodes missing a feature terminate paths through them.
    Null endpoints drop the edge; null features drop the feature row.

    Features quantize to milli-units (``(feat * 1000) as long`` — the
    repo's reference quantization convention, SURVEY.md §2.4) and every
    hop sums in INTEGER space: float summation is order-dependent and
    hop-2 sums reach magnitudes where Spark's and the oracle's partial
    aggregation orders would disagree past the rounding guard; integer
    sums are exact in both engines.
    """
    if hops < 1:
        raise ValueError(f"hops must be >= 1, got {hops}")
    s = F.col(src).cast("string")
    d = F.col(dst).cast("string")
    e = edges.where(s.isNotNull() & d.isNotNull()).select(
        s.alias("u"), d.alias("v")
    )
    if not directed:
        # Canonicalize BEFORE deduplicating (r9-opt, same shape as
        # fastrp): least/greatest folds (a, b) and (b, a) into one row,
        # so the symmetric closure is canon ∪ swap(canon \ self-loops) —
        # disjoint pieces, no second 2|E|-row distinct exchange, and
        # only the canonical half materializes (the closure is a lazy
        # map-only union over its checkpoint blocks).  Self-loops are
        # KEPT here (a node aggregates itself through one) and excluded
        # from the swap so they appear exactly once, as before.
        canon = truncate_lineage(
            e.select(
                F.least(F.col("u"), F.col("v")).alias("u"),
                F.greatest(F.col("u"), F.col("v")).alias("v"),
            ).distinct()
        )
        e = canon.union(
            canon.where(F.col("u") != F.col("v")).select(
                F.col("v").alias("u"), F.col("u").alias("v")
            )
        )
    else:
        e = truncate_lineage(e.distinct())

    state = features.where(
        F.col(id_col).isNotNull() & F.col(feat_col).isNotNull()
    ).select(
        F.col(id_col).cast("string").alias("node"),
        (F.col(feat_col).cast("double") * 1000.0).cast("long").alias("fsum"),
        F.lit(1).cast("long").alias("cnt"),
    )

    outs = []
    # State is O(V) rows per hop — broadcast it into the join so the
    # checkpointed O(E) edge side never re-shuffles (AQE can't size a
    # checkpointed frame, so the hint is explicit); fall back to the
    # shuffle join past the broadcast budget.
    bcast = F.broadcast if _estimate_small(features) else (lambda d: d)
    for hop in range(1, hops + 1):
        state = truncate_lineage(
            e.join(bcast(state.withColumnRenamed("node", "v")), "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.sum("fsum").alias("fsum"), F.sum("cnt").alias("cnt")),
            cache=False,
        )
        outs.append(state.select("node", F.lit(hop).alias("hop"), "fsum", "cnt"))

    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.select(
        "node",
        "hop",
        F.col("cnt").alias("n_paths"),
        (F.col("fsum") / 1000.0).alias("feat_sum"),
        F.round(F.col("fsum") / (F.col("cnt") * 1000.0), 6).alias("feat_mean"),
    )


def neighbor_agg_sql(
    edge_sql: str,
    feat_sql: str,
    *,
    hops: int = 2,
    directed: bool = True,
) -> str:
    """DuckDB oracle replaying :func:`neighbor_agg`.  ``edge_sql`` yields
    (src, dst); ``feat_sql`` yields (id, feat)."""
    mirror = (
        " UNION SELECT CAST(dst AS VARCHAR), CAST(src AS VARCHAR) FROM raw"
        " WHERE src IS NOT NULL AND dst IS NOT NULL"
        if not directed
        else ""
    )
    parts = [
        f"WITH raw AS ({edge_sql})",
        ", e AS (SELECT DISTINCT CAST(src AS VARCHAR) AS u, CAST(dst AS VARCHAR) AS v"
        f" FROM raw WHERE src IS NOT NULL AND dst IS NOT NULL{mirror})",
        f", s0 AS (SELECT CAST(id AS VARCHAR) AS node,"
        f" CAST(CAST(feat AS DOUBLE) * 1000.0 AS BIGINT) AS fsum,"
        f" 1::BIGINT AS cnt FROM ({feat_sql}) WHERE id IS NOT NULL AND feat IS NOT NULL)",
    ]
    for hop in range(1, hops + 1):
        parts.append(
            f", s{hop} AS (SELECT e.u AS node, sum(s.fsum)::BIGINT AS fsum,"
            f" sum(s.cnt)::BIGINT AS cnt"
            f" FROM e JOIN s{hop - 1} s ON s.node = e.v GROUP BY e.u)"
        )
    selects = " UNION ALL ".join(
        f"SELECT node, {h} AS hop, fsum, cnt FROM s{h}" for h in range(1, hops + 1)
    )
    return (
        "\n".join(parts)
        + f"\nSELECT node, hop::INT AS hop, cnt AS n_paths,"
        f" fsum / 1000.0 AS feat_sum,"
        f" round(fsum / (cnt * 1000.0), 6) AS feat_mean"
        f" FROM ({selects})"
    )
