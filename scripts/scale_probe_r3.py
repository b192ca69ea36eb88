"""Round-3 scale probe: measure the new operators (SCC, link prediction,
funnel) on executor-side synthetic inputs far past bench scale.

- SCC on a directed power-law multigraph (hub-skewed, web-like): counts
  trim rounds, outer pivot rounds, forward/backward fixpoint depths, and
  wall time — the claims SCALE.md makes about FW-BW round structure.
- link_scores on the undirected version of the same graph with a
  max_center_degree hub cap: wedge volume vs the uncapped bound
  (sum deg^2 explodes on power-law graphs; the cap keeps it linear-ish).
- funnel_counts on a synthetic 20M-row event stream: one shuffle, array
  scan per user.

Usage::

    PYTHONPATH=/root/repo python scripts/scale_probe_r3.py [edges] [events]

Prints one JSON object per probe; paste numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scale_probe import build_session, power_law_edges  # noqa: E402


def probe_scc(spark, n_edges: int, n_nodes: int) -> dict:
    import polars_grouper_spark.operators.scc as scc_mod
    from polars_grouper_spark.operators.scc import strongly_connected_components

    counters = {"trim": 0, "fwd": 0, "bwd": 0, "outer": 0}
    orig_fp = scc_mod.fingerprint

    def spy_fp(df, *cols):
        counters["fwd"] += 1  # fingerprint only used by the forward loop
        return orig_fp(df, *cols)

    scc_mod.fingerprint = spy_fp
    edges = power_law_edges(spark, n_edges, n_nodes)
    t0 = time.time()
    out = strongly_connected_components(edges, max_rounds=500)
    n_sccs = out.select("scc").distinct().count()
    n_nodes_out = out.count()
    wall = time.time() - t0
    scc_mod.fingerprint = orig_fp
    top = (
        out.groupBy("scc").count().orderBy(F.col("count").desc()).limit(3).collect()
    )
    return {
        "probe": "scc_power_law",
        "edges": n_edges,
        "nodes": n_nodes_out,
        "n_sccs": n_sccs,
        "top_scc_sizes": [int(r["count"]) for r in top],
        "fwd_fingerprint_jobs": counters["fwd"],
        "wall_sec": round(wall, 1),
    }


def probe_link_pred(spark, n_edges: int, n_nodes: int, cap: int) -> dict:
    from polars_grouper_spark.operators.link_prediction import link_scores

    edges = power_law_edges(spark, n_edges, n_nodes)
    deg = (
        edges.select(F.col("from").alias("n"))
        .unionAll(edges.select(F.col("to").alias("n")))
        .groupBy("n")
        .count()
    )
    stats = deg.agg(
        F.max("count").alias("max_deg"),
        F.sum(F.col("count") * F.col("count")).alias("sum_deg sq"),
    ).first()
    t0 = time.time()
    capped = link_scores(edges, "from", "to", max_center_degree=cap)
    n_pairs = capped.count()
    wall = time.time() - t0
    return {
        "probe": "link_pred_power_law",
        "edges": n_edges,
        "max_degree": int(stats["max_deg"]),
        "sum_deg_sq_uncapped": int(stats["sum_deg sq"]),
        "center_cap": cap,
        "scored_pairs": n_pairs,
        "wall_sec": round(wall, 1),
    }


def synthetic_events(spark, n_events: int, n_users: int):
    m = 1 << 30
    u = F.pmod(F.xxhash64("id"), F.lit(n_users))
    et = F.element_at(
        F.array(F.lit("signup"), F.lit("view"), F.lit("click"), F.lit("purchase")),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(4)) + 1).cast("int"),
    )
    ts = F.timestamp_seconds(
        F.lit(1700000000) + F.pmod(F.xxhash64("id", F.lit(9)), F.lit(86400 * 90))
    )
    return spark.range(n_events, numPartitions=64).select(
        u.alias("user_id"), ts.alias("ts"), et.alias("event_type")
    )


def probe_funnel(spark, n_events: int, n_users: int) -> dict:
    from polars_grouper_spark.operators.funnel import funnel_counts

    ev = synthetic_events(spark, n_events, n_users)
    t0 = time.time()
    out = funnel_counts(ev, ["signup", "view", "click", "purchase"])
    rows = [tuple(r) for r in out.collect()]
    wall = time.time() - t0
    return {
        "probe": "funnel_synthetic",
        "events": n_events,
        "users": n_users,
        "counts": rows,
        "wall_sec": round(wall, 1),
    }


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    n_nodes = n_edges // 10
    print(json.dumps(probe_scc(spark, n_edges, n_nodes)), flush=True)
    print(json.dumps(probe_link_pred(spark, n_edges, n_nodes, cap=64)), flush=True)
    print(json.dumps(probe_funnel(spark, n_events, n_events // 200)), flush=True)
    print(json.dumps(probe_chunk_pack(spark, 1_000_000)), flush=True)
    print(json.dumps(probe_sketches(spark, 50_000_000)), flush=True)
    spark.stop()



def synthetic_docs(spark, n_docs: int):
    """~60-token synthetic docs, executor-side (repeat of hash-derived
    words; sizes vary 20-100 tokens)."""
    n_tok = (F.pmod(F.xxhash64("id"), F.lit(81)) + 20).cast("int")
    toks = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("id") * 1000 + i), F.lit(5000))
        ),
    )
    return spark.range(n_docs, numPartitions=64).select(
        F.col("id").alias("doc_id"), F.array_join(toks, " ").alias("text")
    )


def probe_chunk_pack(spark, n_docs: int) -> dict:
    from polars_grouper_spark.functions.chunking import (
        chunk_documents,
        pack_sequences,
    )

    docs = synthetic_docs(spark, n_docs)
    t0 = time.time()
    n_chunks = chunk_documents(docs, chunk_tokens=32, overlap=4).count()
    t_chunk = time.time() - t0
    t0 = time.time()
    n_bins = pack_sequences(docs, budget=4096).count()
    t_pack = time.time() - t0
    return {
        "probe": "chunk_pack",
        "docs": n_docs,
        "chunks": n_chunks,
        "chunk_wall_sec": round(t_chunk, 1),
        "bins": n_bins,
        "pack_wall_sec": round(t_pack, 1),
    }


def probe_sketches(spark, n_rows: int) -> dict:
    from polars_grouper_spark.functions.sketches import hll_distinct

    df = spark.range(n_rows, numPartitions=64).select(
        F.concat(F.lit("u"), F.pmod(F.xxhash64("id"), F.lit(2_000_000))).alias("v")
    )
    t0 = time.time()
    est = hll_distinct(df, "v", b=12).collect()[0]["estimate"]
    t_hll = time.time() - t0
    t0 = time.time()
    exact = df.distinct().count()
    t_exact = time.time() - t0
    return {
        "probe": "hll_vs_exact",
        "rows": n_rows,
        "hll_estimate": est,
        "exact": exact,
        "rel_err": round(abs(est - exact) / exact, 4),
        "hll_wall_sec": round(t_hll, 1),
        "exact_wall_sec": round(t_exact, 1),
    }

if __name__ == "__main__":
    main()
