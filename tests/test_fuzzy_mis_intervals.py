"""Round-4 batch 4: fuzzy ed-1 join, Luby MIS, interval sweeps, and the
Welford streaming stats kernel."""

import duckdb
import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.fuzzy import fuzzy_join_ed1, fuzzy_join_ed1_sql
from polars_grouper_spark.operators.intervals import (
    peak_concurrency,
    peak_concurrency_sql,
)
from polars_grouper_spark.operators.mis import (
    maximal_independent_set,
    maximal_independent_set_sql,
)


# --- fuzzy -----------------------------------------------------------------

def test_fuzzy_catches_all_ed1_kinds(spark):
    vals = [("kitten",), ("sitten",), ("kitte",), ("kittten",), ("cat",)]
    df = spark.createDataFrame(vals, ["v"])
    got = {(a, b) for a, b, _ in fuzzy_join_ed1(df, df, "v", "v").collect()}
    assert ("kitten", "sitten") in got  # substitution
    assert ("kitte", "kitten") in got  # deletion/insertion
    assert ("kitten", "kittten") in got  # insertion
    assert not any("cat" in p for p in got)


def test_fuzzy_shared_deletion_ed2_rejected(spark):
    # 'abc' and 'acd' share the deletion 'ac' but are distance 2
    df = spark.createDataFrame([("abc",), ("acd",)], ["v"])
    assert fuzzy_join_ed1(df, df, "v", "v").count() == 0


def test_fuzzy_duckdb_parity(spark):
    vals = [(w,) for w in ["spark", "spork", "sprk", "sparkk", "stork", "s", "", "xy"]]
    df = spark.createDataFrame(vals, ["v"])
    got = sorted(tuple(r) for r in fuzzy_join_ed1(df, df, "v", "v").collect())
    vs = ",".join(f"('{v[0]}')" for v in vals)
    sql = fuzzy_join_ed1_sql(
        f"SELECT * FROM (VALUES {vs}) t(v)", f"SELECT * FROM (VALUES {vs}) t(v)"
    )
    assert got == sorted(duckdb.sql(sql).fetchall())


# --- MIS --------------------------------------------------------------------

def test_mis_invariants_on_random_graph(spark):
    edges = [(f"n{(5 * i) % 17}", f"n{(2 * i + 3) % 17}") for i in range(40)]
    df = spark.createDataFrame(edges, ["from", "to"])
    got = {r["node"]: r["in_mis"] for r in maximal_independent_set(df).collect()}
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    mis = {n for n, m in got.items() if m}
    # independence
    assert not any(nb in mis for n in mis for nb in adj[n])
    # maximality
    assert all(adj[n] & mis for n, m in got.items() if not m)


def test_mis_duckdb_parity_and_determinism(spark):
    edges = [(f"m{(7 * i) % 19}", f"m{(11 * i + 1) % 19}") for i in range(35)]
    df = spark.createDataFrame(edges, ["from", "to"])
    a = sorted(tuple(r) for r in maximal_independent_set(df).collect())
    b = sorted(tuple(r) for r in maximal_independent_set(df).collect())
    assert a == b
    vals = ",".join(f"('{x}','{y}')" for x, y in edges)
    want = sorted(
        duckdb.sql(
            maximal_independent_set_sql(
                f"SELECT * FROM (VALUES {vals}) t(src, dst)", rounds=14
            )
        ).fetchall()
    )
    assert a == want


def test_mis_local_and_distributed_tiers_identical(spark):
    """The guarded local Luby mirror must equal the distributed loop
    bit-for-bit (same md5 priorities, same win rule)."""
    edges = [(f"m{(7 * i) % 23}", f"m{(11 * i + 1) % 23}") for i in range(45)]
    df = spark.createDataFrame(edges, ["from", "to"])
    loc = sorted(tuple(r) for r in maximal_independent_set(df).collect())
    dist = sorted(
        tuple(r)
        for r in maximal_independent_set(df, max_local_edges=0).collect()
    )
    assert loc == dist


def test_coloring_local_and_distributed_tiers_identical(spark):
    from polars_grouper_spark.operators.coloring import greedy_coloring

    edges = [(f"c{(5 * i) % 19}", f"c{(3 * i + 2) % 19}") for i in range(40)]
    df = spark.createDataFrame(edges, ["from", "to"])
    loc = sorted(tuple(r) for r in greedy_coloring(df).collect())
    dist = sorted(
        tuple(r) for r in greedy_coloring(df, max_local_edges=0).collect()
    )
    assert loc == dist


# --- intervals ---------------------------------------------------------------

def test_peak_closed_interval_tie_rule(spark):
    # end==start of the next: closed intervals overlap at the boundary
    df = spark.createDataFrame([("g", 1, 5), ("g", 5, 9)], ["g", "s", "e"])
    got = peak_concurrency(df, "s", "e", "g").first()
    assert (got["peak"], got["n_intervals"]) == (2, 2)


def test_peak_inverted_and_null_dropped(spark):
    df = spark.createDataFrame(
        [("g", 1, 3), ("g", 9, 2), ("g", None, 4), ("g", 2, None)],
        "g string, s int, e int",
    )
    got = peak_concurrency(df, "s", "e", "g").first()
    assert (got["peak"], got["n_intervals"]) == (1, 1)


def test_peak_duckdb_parity_global(spark):
    iv = [(i % 7, (i * 3) % 11 + i % 7) for i in range(25)]
    iv = [(s, max(s, e)) for s, e in iv]
    df = spark.createDataFrame(iv, ["s", "e"])
    got = sorted(tuple(r) for r in peak_concurrency(df, "s", "e").collect())
    vals = ",".join(f"({s},{e})" for s, e in iv)
    want = sorted(
        duckdb.sql(
            peak_concurrency_sql(f"SELECT * FROM (VALUES {vals}) t(s, e)", "s", "e")
        ).fetchall()
    )
    assert got == want


# --- streaming stats ----------------------------------------------------------

def test_running_user_stats_on_real_stream(spark, tmp_path):
    """Welford streaming state equals the batch two-pass stats after one
    availableNow pass over the whole input."""
    import time

    from polars_grouper_spark.sources import load_table
    from polars_grouper_spark.streaming.stateful import running_user_stats

    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    src = str(tmp_path / "stats_src")
    ev.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    for _ in range(30):
        if not q.isActive:
            break
        time.sleep(1)
    got = {
        r["user_id"]: (r["n_events"], round(r["mean"], 6), round(r["std"], 6))
        for r in spark.sql("select * from user_stats").collect()
    }
    want = {
        r["user_id"]: (r["n_events"], round(r["mean"], 6), round(r["std"], 6))
        for r in running_user_stats(ev).collect()
    }
    assert got == want


def test_coloring_midloop_local_finish_matches_both_tiers(spark):
    """Round-9 per-color tier re-evaluation: a coloring run that starts
    distributed must hand the residual to the driver-local continuation
    (same seed-per-color MIS priorities) once it fits the guard, and the
    full coloring must be bit-identical to the pure-local and
    pure-distributed tiers."""
    from polars_grouper_spark.operators.coloring import greedy_coloring

    edges = [(f"a{i}", f"a{i + 1}") for i in range(30)] + [
        ("h", f"a{i}") for i in range(0, 30, 3)
    ]
    df = spark.createDataFrame(edges, ["from", "to"])
    full_local = sorted(map(tuple, greedy_coloring(df).collect()))
    distributed = sorted(
        map(tuple, greedy_coloring(df, max_local_edges=0).collect())
    )
    mid_switch = sorted(
        map(tuple, greedy_coloring(df, max_local_edges=20).collect())
    )
    assert full_local == distributed == mid_switch
