"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced with a cheap action (count of the result) — results
are small aggregates by construction, so timing measures the plan, not
driver materialization.

Variance control: every query runs $SPARK_GRAFT_BENCH_REPS times
(default 2) and reports the per-query MINIMUM — the run least polluted by
GC pauses / compilation / OS noise, the standard steady-state estimator.
All raw repetitions are emitted under "queries_all" so a regression can be
distinguished from noise without re-running.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from polars_grouper_spark.session import get_spark  # noqa: E402

# The headline set IS the correctness set: every queries() entry is
# benched, so BENCH and CORRECTNESS cover the same surface by construction.
BENCH_QUERIES = list(entry_mod.queries().keys())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark("polars-grouper-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Session warmup (excluded from timings): touch one parquet footer, spin
    # up the Python worker pool, and run one micro-query through the operator
    # machinery (window exec, shuffle/broadcast join, hash aggregate, local
    # checkpoint) so codegen classes are compiled once up front.  Per-query
    # numbers then measure the steady-state plans rather than one-time
    # JVM/worker/JIT startup.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(64, numPartitions=8).mapInPandas(lambda it: it, "id long").count()
    from polars_grouper_spark import components, page_rank_nodes
    from polars_grouper_spark.functions.similarity import ivf_topk
    from polars_grouper_spark.operators.association_rules import (
        graph_association_rules,
    )

    tiny = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e")], ["from", "to"]
    )
    components(tiny).count()
    page_rank_nodes(tiny, max_iterations=1, convergence_threshold=0.0).count()
    vecs = spark.createDataFrame(
        [(i, [float(i + 1), float(i % 3 + 1)]) for i in range(8)], ["vec_id", "embedding"]
    )
    ivf_topk(vecs, vecs.limit(2), k=2, n_cells=2, n_probe=1).count()
    tx = spark.createDataFrame(
        [(1, "a", 1.0), (1, "b", 1.0), (2, "a", 1.0)],
        ["transaction_id", "item_id", "frequency"],
    )
    graph_association_rules(tx, min_support=0.0, min_confidence=0.0).count()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = qs[name]
        runs: list[float] = []
        for _ in range(reps):
            t0 = time.time()
            try:
                fn(spark, sf_dir).count()
                runs.append(round(time.time() - t0, 3))
            except Exception as e:  # noqa: BLE001
                print(f"# {name} FAILED: {e}", file=sys.stderr)
                runs.append(float("nan"))
                break
        best = min(runs)
        timings[name] = best
        raw[name] = runs
        total += best if best == best else 0.0

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "queries_all": raw,
                "reps": reps,
                "agg": "min",
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
