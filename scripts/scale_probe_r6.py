"""Round-6 streaming volume probes (VERDICT r5 #8): the two r5 streaming
additions whose 100 TB state behavior was asserted but not measured.

1. ``StreamingUpsertPublisher`` under a 10M-event replay (100k keys,
   8 chunks, rocksdb state store conf active) — the serving table must
   stay keys-sized, the final table must equal the one-shot batch LWW
   reduction bit for bit, and per-batch wall time must stay flat across
   chunks (state is keys-sized, so batch N must not pay for batch 1..N-1's
   volume).
2. ``StreamingHll`` over the same 10M-event stream (b=12 -> 4096
   registers) — the running register table must equal the one-shot batch
   sketch exactly (max-mergeable registers are order-free), the estimate
   must land within the ~1.6% HLL error envelope of the true 100k
   cardinality, and driver-held state must stay at 4096 rows.

Usage::

    PYTHONPATH=/root/repo python scripts/scale_probe_r6.py

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

N_EVENTS = 10_000_000
N_KEYS = 100_000
N_CHUNKS = 8


def _events(spark):
    """Deterministic 10M-event table: key, ts (monotone-ish), value."""
    return spark.range(N_EVENTS, numPartitions=32).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id"), F.lit(N_KEYS)).alias("user_id"),
        # timestamps deliberately NOT aligned with chunk order per key:
        # LWW must be order-free, so give it something to be wrong about.
        F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1_000_000)).alias("ts"),
        (F.pmod(F.xxhash64(F.col("id") + 13), F.lit(100_000)) / 1000.0).alias(
            "value"
        ),
    )


def probe_publish(spark) -> dict:
    from polars_grouper_spark.streaming.publish import StreamingUpsertPublisher

    ev = _events(spark)
    pub = StreamingUpsertPublisher("user_id", "ts", "event_id", ["value"])
    chunk_walls = []
    t0 = time.time()
    for c in range(N_CHUNKS):
        batch = ev.where(F.pmod(F.col("event_id"), F.lit(N_CHUNKS)) == c)
        tc = time.time()
        pub.update(batch, c)
        chunk_walls.append(round(time.time() - tc, 2))
    wall = time.time() - t0
    table = pub.table()
    n_keys = table.count()

    # one-shot batch LWW over the same 10M rows — must match exactly
    batch_lww = (
        ev.select(
            F.col("user_id").alias("key"),
            F.struct("ts", "event_id", "value").alias("_s"),
        )
        .groupBy("key")
        .agg(F.max("_s").alias("_m"))
        .select(
            "key",
            F.col("_m.ts").alias("ts"),
            F.col("_m.event_id").alias("event_id"),
            F.col("_m.value").alias("value"),
        )
    )
    cols = sorted(table.columns)
    diff = (
        table.select(*cols)
        .exceptAll(batch_lww.select(*cols))
        .unionAll(batch_lww.select(*cols).exceptAll(table.select(*cols)))
        .count()
    )
    return {
        "probe": "stream_publish_10m",
        "events": N_EVENTS,
        "chunks": N_CHUNKS,
        "keys": n_keys,
        "state_rows": n_keys,  # the serving table IS the state
        "diff_vs_batch_lww": diff,
        "chunk_walls_s": chunk_walls,
        "wall_s": round(wall, 1),
    }


def probe_hll_sink(spark) -> dict:
    from polars_grouper_spark.functions.sketches import (
        hll_estimate,
        hll_registers,
    )
    from polars_grouper_spark.streaming.sketch_sink import StreamingHll

    ev = _events(spark)
    sk = StreamingHll("user_id", b=12)
    chunk_walls = []
    t0 = time.time()
    for c in range(N_CHUNKS):
        batch = ev.where(F.pmod(F.col("event_id"), F.lit(N_CHUNKS)) == c)
        tc = time.time()
        sk.update(batch, c)
        chunk_walls.append(round(time.time() - tc, 2))
    wall = time.time() - t0
    est = sk.estimate(spark).collect()[0][0]
    state_rows = len(sk.registers)

    # one-shot batch sketch over the full 10M — must be register-identical
    batch_regs = {
        r["bucket"]: r["max_rho"]
        for r in hll_registers(ev, "user_id", b=12).collect()
    }
    stream_regs = dict(sk.registers)
    regs_equal = batch_regs == stream_regs
    err = abs(est - N_KEYS) / N_KEYS
    return {
        "probe": "stream_hll_sink_10m",
        "events": N_EVENTS,
        "chunks": N_CHUNKS,
        "true_distinct": N_KEYS,
        "estimate": round(est, 1),
        "rel_err": round(err, 4),
        "state_rows": state_rows,
        "registers_equal_batch": regs_equal,
        "chunk_walls_s": chunk_walls,
        "wall_s": round(wall, 1),
    }


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_STATE_STORE", "rocksdb")
    spark = build_session()
    for probe in (probe_publish, probe_hll_sink):
        print(json.dumps(probe(spark)), flush=True)


if __name__ == "__main__":
    main()
