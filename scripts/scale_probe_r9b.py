"""Round-9b scale probe: mid-loop local-finish A/B for the k-core peel
and the greedy-coloring color loop at volume.

Both operators gained per-round tier re-evaluation this round (the r8
matching/MIS pattern): once the shrinking residual fits
``max_local_edges``, the remaining rounds run driver-local.  This probe
measures the effect on graphs that START distributed:

1. ``k_core(k=3)`` on 10M uniform edges — A: pure distributed
   (``max_local_edges=0``); B: default guard (mid-loop finish engages
   when the peeled residual falls under 2M edges).
2. ``greedy_coloring`` on 4M power-law edges — same A/B (each color is
   a full Luby MIS, so handing the shrunken residual to the local
   continuation saves whole MIS runs).

Outputs asserted identical (count + content fingerprint) — exact by
k-core uniqueness / bit-identical seed-per-color MIS priorities.

Usage::

    PYTHONPATH=/root/repo python scripts/scale_probe_r9b.py
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


def run(spark, meter, fn, tag) -> dict:
    r0, w0 = meter.snapshot()
    t0 = time.time()
    out = fn()
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*out.columns)).alias("h"),
    ).first()
    wall = round(time.time() - t0, 1)
    r1, w1 = meter.snapshot()
    rec = {
        "probe": tag,
        "rows": int(row["n"]),
        "fp": int(row["h"] or 0),
        "wall_s": wall,
        "shuffle_read_gb": round((r1 - r0) / 2**30, 2),
        "shuffle_write_gb": round((w1 - w0) / 2**30, 2),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    from polars_grouper_spark.operators.coloring import greedy_coloring
    from polars_grouper_spark.operators.kcore import k_core

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    meter = ShuffleMeter(spark)

    uni = uniform_edges(spark, 10_000_000, 2_000_000).localCheckpoint()
    uni.count()
    a = run(spark, meter, lambda: k_core(uni, 3, max_local_edges=0),
            "kcore3_uniform10M_dist")
    b = run(spark, meter, lambda: k_core(uni, 3),
            "kcore3_uniform10M_midloop")
    assert (a["rows"], a["fp"]) == (b["rows"], b["fp"]), "kcore mismatch"

    pl = power_law_edges(spark, 4_000_000, 1_000_000).localCheckpoint()
    pl.count()
    c = run(spark, meter, lambda: greedy_coloring(pl, max_local_edges=0),
            "coloring_powerlaw4M_dist")
    d = run(spark, meter, lambda: greedy_coloring(pl),
            "coloring_powerlaw4M_midloop")
    assert (c["rows"], c["fp"]) == (d["rows"], d["fp"]), "coloring mismatch"
    print(json.dumps({"identical": True,
                      "kcore_speedup": round(a["wall_s"] / max(b["wall_s"], 0.1), 2),
                      "coloring_speedup": round(c["wall_s"] / max(d["wall_s"], 0.1), 2)}))


if __name__ == "__main__":
    main()
