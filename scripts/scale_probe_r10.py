"""Round-10 at-volume probes (VERDICT r9 item 5): extend the k-truss
session-4 methodology to the two remaining heavy distributed paths.

1. triangle_count / clustering_coefficient ABOVE the broadcast budget
   (``max_broadcast_edges=0``): A/B the packed-bitset wedge prefilter
   against the identical pipeline with the prefilter disabled
   (monkeypatched to identity).  Evidence: shuffle GB + executor task
   time + a checksum proving the outputs identical.
2. The super_merger (connected components) star loop at 10M edges:
   shuffle totals + wall + task time, verified against a driver-side
   union-find (component count and size-multiset checksum).

Shuffle bytes and task time are stall-robust (this host's wall-clock is
not); wall is reported for completeness only.

Usage::

    PYTHONPATH=/root/repo python scripts/scale_probe_r10.py
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


def task_time_s(spark) -> float:
    sc = spark.sparkContext
    sc._jsc.sc().listenerBus().waitUntilEmpty()
    store = sc._jsc.sc().statusStore()
    lst = sc._jvm.scala.collection.JavaConverters.seqAsJavaList(
        store.executorList(False)
    )
    return sum(e.totalDuration() for e in lst) / 1000.0


def checksum(df, *cols) -> tuple:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*cols)).alias("h"),
    ).collect()[0]
    return (int(row["n"]), int(row["h"] or 0))


def probe_triangles(spark, meter, edges, tag: str, n_edges: int, prefilter: bool) -> dict:
    import polars_grouper_spark.operators.triangles as tri
    import polars_grouper_spark.plans.runtime_filter as rtf

    orig = rtf.packed_bitset_prefilter
    if not prefilter:
        rtf.packed_bitset_prefilter = (
            lambda *a, **k: (lambda wedges, cols: wedges)
        )
    try:
        (r0, w0) = meter.snapshot()
        tt0 = task_time_s(spark)
        t0 = time.time()
        out = tri.triangle_count(edges, "from", "to", max_broadcast_edges=0)
        chk = checksum(out.where(F.col("n_triangles") > 0), "node", "n_triangles")
        wall = round(time.time() - t0, 1)
        tt1 = task_time_s(spark)
        (r1, w1) = meter.snapshot()
    finally:
        rtf.packed_bitset_prefilter = orig
    return {
        "probe": f"triangles_dist_{tag}_{'pre' if prefilter else 'nopre'}",
        "edges": n_edges,
        "checksum": chk,
        "wall_s": wall,
        "task_time_s": round(tt1 - tt0, 1),
        "shuffle_read_gb": round((r1 - r0) / 1e9, 2),
        "shuffle_write_gb": round((w1 - w0) / 1e9, 2),
    }


def local_union_find(pairs) -> dict:
    """Component size multiset via union-find over (u, v) id arrays."""
    import numpy as np
    import pandas as pd

    u, v = pairs
    codes, _ = pd.factorize(np.concatenate([u, v]))
    n = codes.max() + 1 if len(codes) else 0
    a, b = codes[: len(u)], codes[len(u):]
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[ry] = rx
    roots = np.array([find(i) for i in range(n)], dtype=np.int64)
    import collections

    sizes = collections.Counter(collections.Counter(roots.tolist()).values())
    return dict(sizes)


def probe_super_merger(spark, meter, edges, tag: str, n_edges: int) -> dict:
    from polars_grouper_spark.operators.connected_components import components

    (r0, w0) = meter.snapshot()
    tt0 = task_time_s(spark)
    t0 = time.time()
    out = components(edges, "from", "to", max_local_edges=0)
    comp_sizes = (
        out.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
        .groupBy("sz").agg(F.count(F.lit(1)).alias("n_comps"))
        .collect()
    )
    wall = round(time.time() - t0, 1)
    tt1 = task_time_s(spark)
    (r1, w1) = meter.snapshot()

    dist_sizes = {int(r["sz"]): int(r["n_comps"]) for r in comp_sizes}
    pdf = edges.toPandas()
    ref_sizes = local_union_find((pdf["from"].to_numpy(), pdf["to"].to_numpy()))
    # size multiset must match exactly; singleton-free comparison (the
    # edge-list contract has no isolated nodes, but self-loop handling
    # could differ — it must not)
    ok = dist_sizes == ref_sizes
    return {
        "probe": f"super_merger_dist_{tag}",
        "edges": n_edges,
        "n_components": sum(dist_sizes.values()),
        "sizes_match_local_union_find": ok,
        "wall_s": wall,
        "task_time_s": round(tt1 - tt0, 1),
        "shuffle_read_gb": round((r1 - r0) / 1e9, 2),
        "shuffle_write_gb": round((w1 - w0) / 1e9, 2),
    }


def main() -> None:
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    meter = ShuffleMeter(spark)

    uni = uniform_edges(spark, 10_000_000, 2_000_000).localCheckpoint()
    pl = power_law_edges(spark, 4_000_000, 1_000_000).localCheckpoint()

    for e, tag, n in ((uni, "uniform10M", 10_000_000), (pl, "powerlaw4M", 4_000_000)):
        a = probe_triangles(spark, meter, e, tag, n, prefilter=True)
        print(json.dumps(a), flush=True)
        b = probe_triangles(spark, meter, e, tag, n, prefilter=False)
        print(json.dumps(b), flush=True)
        print(
            json.dumps({"probe": f"triangles_{tag}_identical", "ok": a["checksum"] == b["checksum"]}),
            flush=True,
        )
    print(json.dumps(probe_super_merger(spark, meter, uni, "uniform10M", 10_000_000)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
