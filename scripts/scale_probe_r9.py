"""Round-9 scale probe: k-truss closure-join A/B at 10M edges (r8 judge
task #5 — the distributed peel was wedge-join-bound: 162 s / 4.65 GB
shuffle read at 10M uniform edges with the sort-merge closure shape).

A/B on the SAME generated graph, pure distributed (``max_local_edges=0``):

1. ``bc0``  — ``max_broadcast_edges=0``: the r8 sort-merge shape (the
   data-sized wedge stream shuffles into the closure join and again into
   the support aggregation's exchange).
2. ``bc20M`` — ``max_broadcast_edges=20_000_000``: E/V-sized tables
   broadcast, wedges generated + closed + partially aggregated map-side
   in one stage (re-evaluated per peel round from the termination
   fingerprint's count).
3. ``midloop`` — default guards: starts distributed, finishes driver-
   local once the residual fits ``max_local_edges`` (round-9 k-core
   pattern).

Outputs are asserted identical across the three runs (count + content
fingerprint).  Also re-probes the 4M power-law graph under bc20M.

Usage::

    PYTHONPATH=/root/repo python scripts/scale_probe_r9.py
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
from scale_probe_r8 import uniform_edges  # noqa: E402


def run(spark, meter, edges, tag, **kw) -> dict:
    from polars_grouper_spark.operators.ktruss import k_truss

    r0, w0 = meter.snapshot()
    t0 = time.time()
    out = k_truss(edges, 3, **kw)
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("src", "dst", "support")).alias("h"),
    ).first()
    wall = round(time.time() - t0, 1)
    r1, w1 = meter.snapshot()
    rec = {
        "probe": f"ktruss_{tag}",
        "truss_edges": int(row["n"]),
        "fp": int(row["h"] or 0),
        "wall_s": wall,
        "shuffle_read_gb": round((r1 - r0) / 2**30, 2),
        "shuffle_write_gb": round((w1 - w0) / 2**30, 2),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    meter = ShuffleMeter(spark)

    uni = uniform_edges(spark, 10_000_000, 2_000_000).localCheckpoint()
    uni.count()

    a = run(spark, meter, uni, "uniform10M_bc0",
            max_local_edges=0, max_broadcast_edges=0)
    b = run(spark, meter, uni, "uniform10M_bc20M",
            max_local_edges=0, max_broadcast_edges=20_000_000)
    c = run(spark, meter, uni, "uniform10M_midloop",
            max_broadcast_edges=20_000_000)
    assert a["truss_edges"] == b["truss_edges"] == c["truss_edges"]
    assert a["fp"] == b["fp"] == c["fp"], "output mismatch across shapes"
    print(json.dumps({"identical": True, "speedup_bc": round(a["wall_s"] / max(b["wall_s"], 0.1), 2)}))

    pl = power_law_edges(spark, 4_000_000, 1_000_000).localCheckpoint()
    pl.count()
    run(spark, meter, pl, "powerlaw4M_bc20M",
        max_local_edges=0, max_broadcast_edges=20_000_000)


if __name__ == "__main__":
    main()
