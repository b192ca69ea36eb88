"""Multi-hop neighbor feature aggregation — hand-computed hops, path
semantics, directionality, missing-feature termination, DuckDB parity."""

import duckdb

from polars_grouper_spark.operators.neighbor_agg import neighbor_agg, neighbor_agg_sql


def rows(df):
    return {(r["node"], r["hop"]): (r["n_paths"], r["feat_sum"], r["feat_mean"]) for r in df.collect()}


def test_directed_two_hops_hand_computed(spark):
    # a -> b -> c, a -> c ; feats: a=1, b=10, c=100
    edges = spark.createDataFrame([("a", "b"), ("b", "c"), ("a", "c")], ["from", "to"])
    feats = spark.createDataFrame(
        [("a", 1.0), ("b", 10.0), ("c", 100.0)], ["node", "feat"]
    )
    got = rows(neighbor_agg(edges, feats, hops=2))
    # hop1: a sees {b, c} = 110 over 2 paths; b sees {c} = 100
    assert got[("a", 1)] == (2, 110.0, 55.0)
    assert got[("b", 1)] == (1, 100.0, 100.0)
    assert ("c", 1) not in got  # c has no out-edges
    # hop2: paths a->b->c = 100 (a->c->∅ dies: c's hop1 is empty)
    assert got[("a", 2)] == (1, 100.0, 100.0)
    assert ("b", 2) not in got


def test_parallel_paths_count_twice(spark):
    # u -> v, u -> w, v -> t, w -> t : two length-2 paths u ~> t
    edges = spark.createDataFrame(
        [("u", "v"), ("u", "w"), ("v", "t"), ("w", "t")], ["from", "to"]
    )
    feats = spark.createDataFrame([("t", 7.0)], ["node", "feat"])
    got = rows(neighbor_agg(edges, feats, hops=2))
    assert got[("u", 2)] == (2, 14.0, 7.0)  # t counted once per path


def test_undirected_mirrors(spark):
    edges = spark.createDataFrame([("a", "b")], ["from", "to"])
    feats = spark.createDataFrame([("a", 3.0), ("b", 5.0)], ["node", "feat"])
    got = rows(neighbor_agg(edges, feats, hops=1, directed=False))
    assert got[("a", 1)] == (1, 5.0, 5.0)
    assert got[("b", 1)] == (1, 3.0, 3.0)


def test_null_endpoints_and_missing_feats_drop(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", None), (None, "b")], ["from", "to"]
    )
    feats = spark.createDataFrame([("b", 2.5)], ["node", "feat"])
    got = rows(neighbor_agg(edges, feats, hops=1))
    assert got == {("a", 1): (1, 2.5, 2.5)}


def test_duckdb_parity(spark):
    edges = [(f"n{(3 * i) % 7}", f"n{(2 * i + 1) % 7}") for i in range(15)]
    feats = [(f"n{i}", float(i * i) + 0.25) for i in range(7)]
    e = spark.createDataFrame(edges, ["from", "to"])
    f = spark.createDataFrame(feats, ["node", "feat"])
    got = sorted(tuple(r) for r in neighbor_agg(e, f, hops=3).collect())
    ev = ",".join(f"('{a}','{b}')" for a, b in edges)
    fv = ",".join(f"('{n}',{x!r})" for n, x in feats)
    sql = neighbor_agg_sql(
        f"SELECT * FROM (VALUES {ev}) e(src, dst)",
        f"SELECT * FROM (VALUES {fv}) f(id, feat)",
        hops=3,
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


def test_undirected_self_loop_counts_once(spark):
    """r9-opt mirror canonicalization: a self-loop must contribute its
    own feature exactly once per hop (it folded to one row under the old
    mirror+distinct too)."""
    from pyspark.sql import functions as F
    from polars_grouper_spark.operators.neighbor_agg import neighbor_agg

    edges = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "a")], ["from", "to"]
    )
    feats = spark.createDataFrame([("a", 1.0), ("b", 10.0)], ["node", "feat"])
    got = {
        (r["node"], r["hop"]): (r["n_paths"], r["feat_sum"])
        for r in neighbor_agg(edges, feats, hops=1, directed=False).collect()
    }
    # undirected edge set: {(a,a), (a,b), (b,a)} -> a sees a and b once
    # each; b sees a once.
    assert got == {("a", 1): (2, 11.0), ("b", 1): (1, 1.0)}, got
