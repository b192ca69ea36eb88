"""Betweenness centrality — Brandes, parallelized over sources.

Reference parity: ``/root/reference/src/graph_betweenness_centrality.rs``
(textbook Brandes 2001, unweighted BFS variant) and
``/root/reference/polars_grouper/__init__.py:375-452``.

Semantics replicated exactly:

- Null endpoint drops the edge row; adjacency keeps duplicate edge rows —
  a duplicate edge multiplies shortest-path counts (``paths[w] += paths[v]``
  runs once per parallel edge, ``graph_betweenness_centrality.rs:80-92``),
  so the kernel tracks edge *multiplicities*.
- ``directed=False`` (default) mirrors each edge.
- Undirected scores are halved; ``normalized`` multiplies by
  ``1/((n-1)(n-2))`` directed or ``2/((n-1)(n-2))`` undirected, with n =
  total node count of the whole input (not per component).
- Output: ``(node string, centrality double)``, one row per interned node,
  ordered by first appearance.

Spark-first design: exact Brandes is one BFS per source — embarrassingly
parallel over sources.  The (deduplicated, multiplicity-weighted)
adjacency is broadcast to executors; sources fan out via ``applyInPandas``
over hash-chunked source batches; partial dependency sums come back as
``(nid, delta)`` rows and are reduced with a key-partitioned sum.  The
broadcast bounds the exact kernel to graphs whose adjacency fits in
executor memory (~10^7-10^8 edges) — the same single-machine regime as the
reference; for larger graphs sample sources (``sample_sources=``,
Brandes–Pich approximation, scores scaled by n/k).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def betweenness_centrality(
    df: DataFrame,
    from_col: str = "from",
    to_col: str = "to",
    normalized: bool = True,
    directed: bool = False,
    sample_sources: int | None = None,
) -> DataFrame:
    spark = df.sparkSession

    edges = df.select(
        F.col(from_col).cast("string").alias("src"),
        F.col(to_col).cast("string").alias("dst"),
        F.monotonically_increasing_id().alias("_i"),
    ).where(F.col("src").isNotNull() & F.col("dst").isNotNull())

    # Intern: first-appearance nid (dense, for array-indexed kernel).
    endpoints = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("node"), (F.col("_i") * 2).alias("seen")),
                F.struct(F.col("dst").alias("node"), (F.col("_i") * 2 + 1).alias("seen")),
            )
        ).alias("x")
    ).select("x.node", "x.seen")
    first_seen = endpoints.groupBy("node").agg(F.min("seen").alias("seen")).orderBy("seen")
    node_names = [r["node"] for r in first_seen.collect()]
    n = len(node_names)
    empty_schema = "node string, centrality double"
    if n == 0:
        return spark.createDataFrame([], schema=empty_schema)
    nid_of = {name: i for i, name in enumerate(node_names)}

    # Multiplicity-compressed adjacency (duplicate edges preserved as counts).
    pair_counts = edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("m")).collect()
    adj: list[dict[int, int]] = [dict() for _ in range(n)]
    for r in pair_counts:
        u, v, m = nid_of[r["src"]], nid_of[r["dst"]], r["m"]
        adj[u][v] = adj[u].get(v, 0) + m
        if not directed:
            adj[v][u] = adj[v].get(u, 0) + m
    adj_lists = [list(d.items()) for d in adj]
    bc_adj = spark.sparkContext.broadcast(adj_lists)

    if sample_sources is not None and sample_sources < n:
        import random

        rng = random.Random(42)
        source_ids = rng.sample(range(n), sample_sources)
        scale = n / float(sample_sources)
    else:
        source_ids = list(range(n))
        scale = 1.0

    n_chunks = max(1, min(len(source_ids), spark.sparkContext.defaultParallelism * 2))
    src_df = spark.createDataFrame(
        [(s, s % n_chunks) for s in source_ids], schema="source long, chunk long"
    )

    def brandes_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        from collections import deque

        adj_local = bc_adj.value
        nn = len(adj_local)
        cent = [0.0] * nn
        for source in pdf["source"]:
            source = int(source)
            sigma = [0] * nn
            distv = [-1] * nn
            preds: list[list[tuple[int, int]]] = [[] for _ in range(nn)]
            sigma[source] = 1
            distv[source] = 0
            order = []
            q = deque([source])
            while q:
                v = q.popleft()
                order.append(v)
                dv = distv[v]
                for w, m in adj_local[v]:
                    if distv[w] < 0:
                        distv[w] = dv + 1
                        q.append(w)
                    if distv[w] == dv + 1:
                        sigma[w] += sigma[v] * m
                        preds[w].append((v, m))
            delta = [0.0] * nn
            for w in reversed(order):
                sw = sigma[w]
                coeff_base = (1.0 + delta[w]) / sw if sw else 0.0
                for v, m in preds[w]:
                    delta[v] += m * sigma[v] * coeff_base
                if w != source:
                    cent[w] += delta[w]
        nz = [(i, c) for i, c in enumerate(cent) if c != 0.0]
        if not nz:
            return pd.DataFrame({"nid": pd.Series([], dtype="int64"), "delta": pd.Series([], dtype="float64")})
        return pd.DataFrame({"nid": [i for i, _ in nz], "delta": [c for _, c in nz]})

    partials = src_df.groupBy("chunk").applyInPandas(brandes_chunk, "nid long, delta double")
    sums = {r["nid"]: r["s"] for r in partials.groupBy("nid").agg(F.sum("delta").alias("s")).collect()}

    cent = [scale * sums.get(i, 0.0) for i in range(n)]
    if not directed:
        cent = [c / 2.0 for c in cent]
    if normalized:
        nf = float(n)
        denom = (nf - 1.0) * (nf - 2.0)
        # n <= 2 divides by zero in the reference too (inf/nan mirrored).
        norm = (1.0 if directed else 2.0) / denom if denom != 0.0 else float("inf")
        cent = [c * norm for c in cent]

    return spark.createDataFrame(
        list(zip(node_names, [float(c) for c in cent])), schema=empty_schema
    )
