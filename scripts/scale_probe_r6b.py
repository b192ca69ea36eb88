"""Round-6 batch-2 scale probes: incremental CC at volume, and the
sqrt(N)-cells IVF guidance measured on a 200k-vector corpus.

1. ``incremental_components``: 10M-edge base graph (1M nodes), then a
   100k-edge daily batch.  The claim under test is the O(batch + labels)
   loop: the incremental merge must (a) produce labels identical to the
   full recompute over base ∪ batch (canonical min-names), and (b) cost a
   small fraction of the full recompute's wall.
2. IVF quantization at volume: 200k × 32-dim clustered vectors, recall@10
   for 100 queries against exact ``cosine_topk`` ground truth, comparing a
   coarse grid (64 cells / 16 probes, scan 25%) against the sqrt(N) rule
   (448 cells / 16 probes, scan 3.6% — 7x fewer candidates).  The round-6
   claim: finer cells hold recall while slashing candidate volume; at
   100 TB the candidate count IS the cost.

Usage::

    PYTHONPATH=/root/repo python scripts/scale_probe_r6b.py

Prints one JSON object per probe; paste numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from scale_probe import build_session  # noqa: E402


def probe_incremental_cc(spark) -> dict:
    from polars_grouper_spark.operators.connected_components import (
        components,
        incremental_components,
    )
    from polars_grouper_spark.plans.iteration import truncate_lineage

    n_nodes, n_base, n_batch = 1_000_000, 10_000_000, 100_000

    def edge_table(n, salt):
        return (
            spark.range(n, numPartitions=32)
            .select(
                F.concat(
                    F.lit("n"), F.pmod(F.xxhash64("id"), F.lit(n_nodes))
                ).alias("from"),
                F.concat(
                    F.lit("n"),
                    F.pmod(F.xxhash64(F.col("id") + salt), F.lit(n_nodes)),
                ).alias("to"),
            )
        )

    base = truncate_lineage(edge_table(n_base, 1_000_000_007))
    batch = truncate_lineage(edge_table(n_batch, 777_000_017))

    t0 = time.time()
    labels = truncate_lineage(
        components(base, "from", "to").select("node", "component")
    )
    n_labels = labels.count()
    wall_base = time.time() - t0

    t0 = time.time()
    inc = truncate_lineage(
        incremental_components(labels, batch, "from", "to")
    )
    n_inc = inc.count()
    wall_inc = time.time() - t0

    t0 = time.time()
    full = components(
        base.unionByName(batch), "from", "to"
    ).select("node", "component")
    n_full = full.count()
    wall_full = time.time() - t0

    diff = (
        inc.exceptAll(full).unionAll(full.exceptAll(inc)).count()
    )
    return {
        "probe": "incremental_cc_10m",
        "base_edges": n_base,
        "batch_edges": n_batch,
        "nodes_labeled": n_labels,
        "inc_rows": n_inc,
        "full_rows": n_full,
        "labels_identical": diff == 0,
        "wall_base_cc_s": round(wall_base, 1),
        "wall_incremental_s": round(wall_inc, 1),
        "wall_full_recompute_s": round(wall_full, 1),
        "speedup_vs_recompute": round(wall_full / max(wall_inc, 1e-9), 2),
    }


def probe_ivf_sqrtn(spark) -> dict:
    import math

    from polars_grouper_spark.functions import similarity as sim

    n, dim, n_clusters = 200_000, 32, 64
    # clustered corpus: anchor per cluster + small deterministic jitter —
    # the realistic embedding shape (angular structure, not uniform).
    vecs = spark.range(n, numPartitions=32).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (
                F.pmod(F.xxhash64(F.pmod(F.col("id"), F.lit(n_clusters)) * 131 + d), F.lit(1000)) / 250.0
                + F.pmod(F.xxhash64(F.col("id") * 7919 + d), F.lit(100)) / 500.0
            ).cast("double"),
        ).alias("embedding"),
    )
    from polars_grouper_spark.plans.iteration import truncate_lineage

    vecs = truncate_lineage(vecs)
    queries = truncate_lineage(vecs.where(F.pmod("vec_id", F.lit(2000)) == 0))  # 100

    def neighbor_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    t0 = time.time()
    truth = neighbor_sets(sim.cosine_topk(vecs, queries, k=10))
    wall_exact = time.time() - t0

    def recall(approx):
        got = neighbor_sets(approx)
        return sum(
            len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
        ) / len(truth)

    out = {"probe": "ivf_sqrtn_200k", "n": n, "dim": dim,
           "wall_exact_truth_s": round(wall_exact, 1), "configs": []}
    sqrt_cells = int(math.sqrt(n))  # 447
    for n_cells, n_probe in [(64, 16), (sqrt_cells, 16), (sqrt_cells, 32)]:
        t0 = time.time()
        r = recall(
            sim.ivf_topk(
                vecs, queries, k=10, n_cells=n_cells, n_probe=n_probe,
                assign="arrow",
            )
        )
        out["configs"].append(
            {
                "n_cells": n_cells,
                "n_probe": n_probe,
                "scan_frac": round(n_probe / n_cells, 4),
                "recall_at_10": round(r, 3),
                "wall_s": round(time.time() - t0, 1),
            }
        )
        print(json.dumps(out["configs"][-1]), flush=True)
    return out


def main() -> None:
    spark = build_session()
    for probe in (probe_incremental_cc, probe_ivf_sqrtn):
        print(json.dumps(probe(spark)), flush=True)


if __name__ == "__main__":
    main()
