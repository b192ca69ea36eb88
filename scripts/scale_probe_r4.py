"""Round-4 scale probe: deterministic walks at ~10^7 edges.

VERDICT r3 task #4: probe the walk generators the way CC/PageRank were
probed — executor-side synthetic graphs far past bench scale, per-step
shuffle bytes from the UI REST API, zero driver-sized state.

- ``random_walks`` on a 10M-edge power-law multigraph with
  ``max_walks``-bounded starts (the giant-graph mode added this round):
  per-step frontier size, per-step shuffle read/write.
- ``node2vec_walks`` on a (smaller, it does 2 joins + a window per step)
  power-law graph: the same, plus the candidate-row count of the last
  step — the Σdeg-shaped intermediate the window runs over.
- ``random_walks`` all-starts mode on the same 10M-edge graph (the
  embedding-corpus default: every node walks).

Usage::

    PYTHONPATH=/root/repo python scripts/scale_probe_r4.py [edges] [n2v_edges]

Prints one JSON object per probe; paste numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scale_probe import ShuffleMeter, build_session, power_law_edges  # noqa: E402


def probe_random_walks(
    spark, meter, n_edges: int, n_nodes: int, *, walk_length: int,
    max_walks: "int | None", label: str,
) -> dict:
    from polars_grouper_spark.operators.walks import random_walks

    edges = power_law_edges(spark, n_edges, n_nodes)
    t0 = time.time()
    out = random_walks(
        edges,
        walk_length=walk_length,
        walks_per_node=1,
        portable=False,  # production mode: xxhash64, no oracle replay needed
        max_walks=max_walks,
    )
    per_step = (
        out.groupBy("step").count().orderBy("step").collect()
    )
    rd0, wr0 = meter.snapshot()
    total = out.count()
    rd1, wr1 = meter.snapshot()
    wall = time.time() - t0
    return {
        "probe": f"random_walks_{label}",
        "edges": n_edges,
        "nodes_requested": n_nodes,
        "walk_length": walk_length,
        "max_walks": max_walks,
        "rows_out": total,
        "per_step_frontier": {int(r["step"]): int(r["count"]) for r in per_step},
        "count_shuffle_read_mb": round((rd1 - rd0) / 1e6, 1),
        "count_shuffle_write_mb": round((wr1 - wr0) / 1e6, 1),
        "wall_sec": round(wall, 1),
    }


def probe_node2vec(
    spark, meter, n_edges: int, n_nodes: int, *, walk_length: int,
    max_walks: int,
) -> dict:
    from polars_grouper_spark.operators.walks import node2vec_walks

    edges = power_law_edges(spark, n_edges, n_nodes)
    # candidate volume of one step = sum of out-degrees over the frontier
    deg = (
        edges.groupBy("from").count().agg(
            F.max("count").alias("max_deg"),
            F.avg("count").alias("avg_deg"),
        ).first()
    )
    rd0, wr0 = meter.snapshot()
    t0 = time.time()
    out = node2vec_walks(
        edges,
        p=2.0,
        q=0.5,
        walk_length=walk_length,
        walks_per_node=1,
        portable=False,
        max_walks=max_walks,
    )
    total = out.count()
    wall = time.time() - t0
    rd1, wr1 = meter.snapshot()
    return {
        "probe": "node2vec_walks_power_law",
        "edges": n_edges,
        "nodes_requested": n_nodes,
        "max_deg": int(deg["max_deg"]),
        "avg_deg": round(float(deg["avg_deg"]), 1),
        "walk_length": walk_length,
        "max_walks": max_walks,
        "rows_out": total,
        "shuffle_read_mb": round((rd1 - rd0) / 1e6, 1),
        "shuffle_write_mb": round((wr1 - wr0) / 1e6, 1),
        "wall_sec": round(wall, 1),
    }


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n2v_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    meter = ShuffleMeter(spark)

    print(json.dumps(probe_random_walks(
        spark, meter, n_edges, n_edges // 10,
        walk_length=8, max_walks=100_000, label="seeded_100k",
    )), flush=True)
    print(json.dumps(probe_random_walks(
        spark, meter, n_edges, n_edges // 10,
        walk_length=4, max_walks=None, label="all_starts",
    )), flush=True)
    print(json.dumps(probe_node2vec(
        spark, meter, n2v_edges, n2v_edges // 10,
        walk_length=4, max_walks=50_000,
    )), flush=True)


if __name__ == "__main__":
    main()
