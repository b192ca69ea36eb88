"""Round-9c scale probe: semdedup (SemDeDup) at volume.

1. 50k-vector A/B — oracle-parity expression path vs the production
   ``assign="arrow"`` path (numpy cell assignment + per-cell blocked
   GEMM instead of the pair self-join).  Keep decisions compared
   exactly: the two paths must agree on every id away from float
   boundaries.
2. 500k vectors / 64 dims / 512 cells with 5% planted near-dups —
   production path only: wall, shuffle GB, planted-dup recall (a
   planted dup is caught iff the quantizer co-locates it with its
   source — the paper's recall/cost trade), and the Σ|cell|² candidate
   volume vs the N² naive count.

Usage::

    PYTHONPATH=/root/repo python scripts/scale_probe_r9c.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from scale_probe import ShuffleMeter, build_session  # noqa: E402

DIM = 64
ANCHORS = 200


def corpus(spark, n_base: int, n_dups: int):
    """Deterministic clustered corpus + planted near-dups.

    Base id i: anchor[i % ANCHORS] + per-id noise (scale 0.3).
    Planted id n_base + j: copy of base (j * 7) % n_base + noise 1e-3.
    """
    import numpy as np
    import pandas as pd

    def gen(batches):
        rng_dim = np.arange(DIM)
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            src = np.where(ids < n_base, ids, (ids - n_base) * 7 % n_base)
            scale = np.where(ids < n_base, 0.3, 1e-3)
            anchor = (src % ANCHORS)[:, None] * 37.0 % 101.0
            base_rng = np.sin((src[:, None] + 1) * (rng_dim + 3) * 0.7919)
            noise = np.sin((ids[:, None] + 17) * (rng_dim + 11) * 2.3271)
            V = np.cos(anchor + rng_dim * 0.13) + 0.3 * base_rng
            V = V + scale[:, None] * noise
            yield pd.DataFrame({"vec_id": ids, "embedding": list(V)})

    return spark.range(n_base + n_dups, numPartitions=64).mapInPandas(
        gen, "vec_id long, embedding array<double>"
    )


def main() -> None:
    from polars_grouper_spark.functions import similarity as sim

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    meter = ShuffleMeter(spark)
    results = []

    # --- A/B at 50k: expr (oracle parity) vs arrow (production) ---
    small = corpus(spark, 47_500, 2_500).cache()
    small.count()
    for assign in ("expr", "arrow"):
        r0, w0 = meter.snapshot()
        t0 = time.time()
        out = sim.semdedup(small, threshold=0.9, n_cells=64, assign=assign)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("keep").cast("long")).alias("kept"),
            F.bit_xor(F.xxhash64("id", "cell", "keep")).alias("fp"),
        ).first()
        wall = round(time.time() - t0, 1)
        r1, w1 = meter.snapshot()
        rec = {
            "probe": f"semdedup_50k_{assign}",
            "rows": int(agg["n"]),
            "kept": int(agg["kept"]),
            "fp": int(agg["fp"] or 0),
            "wall_s": wall,
            "shuffle_read_gb": round((r1 - r0) / 2**30, 2),
            "shuffle_write_gb": round((w1 - w0) / 2**30, 2),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)
    assert results[0]["rows"] == results[1]["rows"] == 50_000
    # keep DECISIONS must agree (fingerprint covers id+cell+keep)
    assert results[0]["fp"] == results[1]["fp"], "expr/arrow keep sets differ"
    small.unpersist()

    # --- 500k production run with planted dups ---
    n_base, n_dups = 475_000, 25_000
    big = corpus(spark, n_base, n_dups).cache()
    big.count()
    r0, w0 = meter.snapshot()
    t0 = time.time()
    out = sim.semdedup(
        big, threshold=0.9, n_cells=512, assign="arrow"
    ).cache()
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
        F.sum(
            ((F.col("id") >= n_base) & ~F.col("keep")).cast("long")
        ).alias("planted_dropped"),
    ).first()
    wall = round(time.time() - t0, 1)
    r1, w1 = meter.snapshot()
    cells = out.groupBy("cell").count().select(
        F.sum(F.col("count") * F.col("count")).alias("pair_vol"),
        F.max("count").alias("max_cell"),
    ).first()
    rec = {
        "probe": "semdedup_500k_arrow",
        "rows": int(agg["n"]),
        "kept": int(agg["kept"]),
        "planted": n_dups,
        "planted_dropped": int(agg["planted_dropped"]),
        "planted_recall": round(int(agg["planted_dropped"]) / n_dups, 4),
        "pair_volume": int(cells["pair_vol"]),
        "naive_pair_volume": (n_base + n_dups) ** 2,
        "max_cell": int(cells["max_cell"]),
        "wall_s": wall,
        "shuffle_read_gb": round((r1 - r0) / 2**30, 2),
        "shuffle_write_gb": round((w1 - w0) / 2**30, 2),
    }
    print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
