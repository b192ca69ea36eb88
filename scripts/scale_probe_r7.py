"""Round-7 scale probes (VERDICT r6 next-round #4 + re-probe #3).

1. edge_embeddedness candidate-volume curve: the wedge join is the
   only quadratic-capable intermediate; densify the co-purchase graph
   (k items per basket slot instead of 1 — the axis the judge asked
   about) and measure wedge rows / output rows / wall against input
   edges.
2. frequent_triples pruning curve: same densification on the brand
   baskets; measure f1 / f2 / candidate-triples / pairs-in-tx sizes to
   confirm downward closure keeps the C(t,3) blowup off the plan.
3. Re-probe the 10M-edge layered-DAG toposort on the NEW two-tier
   implementation (the r6c number covered the old per-level loop).

Run: PYTHONPATH=/root/repo python scripts/scale_probe_r7.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from polars_grouper_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_session():
    spark = get_spark("scale-probe-r7")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _dense_baskets(spark, k: int):
    """The embeddedness_parts basket relation, densified k×: each
    lineitem row contributes k distinct pseudo-parts to its order, so
    per-basket item count — and with it wedge fan-out — scales with k
    while the order count stays fixed (pure density axis)."""
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    a = li.where(F.col("l_partkey") % 3 == 0).select(
        "l_orderkey", F.col("l_partkey").alias("pk")
    )
    rep = spark.range(k).select(F.col("id").alias("rep"))
    return a.crossJoin(rep).select(
        "l_orderkey",
        F.concat(F.lit("P"), F.col("pk") + F.col("rep") * 7001).alias("p"),
    )


def probe_embeddedness(spark) -> list[dict]:
    from polars_grouper_spark.operators.triangles import edge_embeddedness

    out = []
    for k in (1, 2, 3):
        baskets = _dense_baskets(spark, k)
        edges = (
            baskets.alias("x")
            .join(baskets.alias("y"), "l_orderkey")
            .where(F.col("x.p") < F.col("y.p"))
            .select(F.col("x.p").alias("src"), F.col("y.p").alias("dst"))
        )
        e = edges.distinct().localCheckpoint()
        n_edges = e.count()
        # the operator's only quadratic-capable intermediate, measured
        # with the operator's own shape: symmetric wedge join
        sym = e.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
            e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
        w1 = sym.select(F.col("v").alias("w"), F.col("u").alias("x"))
        w2 = sym.select(F.col("v").alias("w"), F.col("u").alias("y"))
        n_wedges = w1.join(w2, "w").where(F.col("x") < F.col("y")).count()
        t0 = time.time()
        n_out = edge_embeddedness(e, "src", "dst").count()
        wall = time.time() - t0
        out.append(
            {
                "probe": "embeddedness_density",
                "k": k,
                "edges": n_edges,
                "wedge_rows": n_wedges,
                "out_rows": n_out,
                "wedges_per_edge": round(n_wedges / max(n_edges, 1), 1),
                "wall_s": round(wall, 1),
            }
        )
        print(json.dumps(out[-1]), flush=True)
    return out


def probe_triples(spark) -> list[dict]:
    from polars_grouper_spark.operators.itemsets import frequent_triples

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey"
    )
    part = spark.read.parquet(os.path.join(SF_DIR, "part.parquet")).select(
        "p_partkey", "p_brand"
    )
    out = []
    for k in (1, 2, 3):
        rep = spark.range(k).select(F.col("id").alias("rep"))
        # densify: each line contributes its brand plus k-1 shifted
        # pseudo-brands, so baskets carry k× the distinct items
        baskets = (
            li.join(part, li["l_partkey"] == part["p_partkey"])
            .crossJoin(rep)
            .select(
                "l_orderkey",
                F.when(F.col("rep") == 0, F.col("p_brand"))
                .otherwise(F.concat(F.col("p_brand"), F.lit("#"), F.col("rep")))
                .alias("p_brand"),
            )
        )
        tx = (
            baskets.select(
                F.col("l_orderkey").alias("tx"),
                F.col("p_brand").cast("string").alias("it"),
            )
            .distinct()
            .localCheckpoint()
        )
        min_support = 25
        f1 = (
            tx.groupBy("it")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= min_support)
        )
        tx1 = tx.join(F.broadcast(f1.select("it")), "it")
        pairs_in_tx = (
            tx1.alias("x")
            .join(tx1.alias("y"), "tx")
            .where(F.col("x.it") < F.col("y.it"))
            .select("tx", F.col("x.it").alias("a"), F.col("y.it").alias("b"))
        )
        f2 = (
            pairs_in_tx.groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= min_support)
            .select("a", "b")
            .localCheckpoint()
        )
        cand = (
            f2.alias("p")
            .join(f2.alias("q"), F.col("p.a") == F.col("q.a"))
            .where(F.col("p.b") < F.col("q.b"))
            .select(
                F.col("p.a").alias("a"),
                F.col("p.b").alias("b"),
                F.col("q.b").alias("c"),
            )
            .join(
                f2.select(F.col("a").alias("b"), F.col("b").alias("c")),
                ["b", "c"],
                "left_semi",
            )
        )
        sizes = {
            "tx_rows": tx.count(),
            "f1": f1.count(),
            "pairs_in_tx": pairs_in_tx.count(),
            "f2": f2.count(),
            "cand_triples": cand.count(),
        }
        t0 = time.time()
        n_out = frequent_triples(
            baskets, "l_orderkey", "p_brand", min_support=min_support
        ).count()
        wall = time.time() - t0
        # the blowup the pruning must beat: sum over tx of C(t,3)
        naive = (
            tx.groupBy("tx")
            .agg(F.count(F.lit(1)).alias("t"))
            .select(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (F.col("t") - 2) / 6
                ).alias("n")
            )
            .first()["n"]
        )
        out.append(
            {
                "probe": "triples_density",
                "k": k,
                **sizes,
                "naive_c_t_3": int(naive),
                "out_rows": n_out,
                "wall_s": round(wall, 1),
            }
        )
        print(json.dumps(out[-1]), flush=True)
    return out


def probe_toposort_two_tier(spark) -> dict:
    """Re-probe the r6c 10M-edge layered DAG on the NEW implementation
    (distinct edges > max_local_edges, so this exercises the blocked
    distributed peel; a second run at 3M distinct exercises the
    local-solve tier on the same shape)."""
    from polars_grouper_spark.operators.toposort import topological_levels

    results = {}
    for label, n_edges, width in (("local_tier", 3_000_000, 20_000), ("distributed_tier", 10_000_000, 50_000)):
        n_levels = 20
        edges = spark.range(n_edges, numPartitions=32).select(
            F.pmod(F.xxhash64("id"), F.lit(n_levels - 1)).alias("lv"),
            F.pmod(F.xxhash64(F.col("id") + 3), F.lit(width)).alias("a"),
            F.pmod(F.xxhash64(F.col("id") + 5), F.lit(width)).alias("b"),
        ).select(
            F.concat(F.lit("L"), "lv", F.lit("_"), "a").alias("from"),
            F.concat(F.lit("L"), F.col("lv") + 1, F.lit("_"), "b").alias("to"),
        )
        t0 = time.time()
        out = topological_levels(edges, "from", "to")
        n_nodes = out.count()
        n_lvls = out.agg(F.countDistinct("level")).first()[0]
        results[label] = {
            "edges": n_edges,
            "nodes_labeled": n_nodes,
            "levels": n_lvls,
            "wall_s": round(time.time() - t0, 1),
        }
        print(json.dumps({"probe": f"toposort_{label}", **results[label]}), flush=True)
    return {"probe": "toposort_two_tier", **results}


def main() -> None:
    spark = build_session()
    probe_embeddedness(spark)
    probe_triples(spark)
    probe_toposort_two_tier(spark)


if __name__ == "__main__":
    main()
