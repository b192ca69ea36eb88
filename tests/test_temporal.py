"""Time-respecting reachability — waiting rule, non-decreasing paths,
seed semantics, DuckDB parity."""

import datetime as dt

import duckdb
import pytest

from polars_grouper_spark.operators.temporal import (
    temporal_reachability,
    temporal_reachability_sql,
)

BASE = dt.datetime(2024, 1, 1)


def T(h):
    return BASE + dt.timedelta(hours=h)


def run(spark, edges, sources, hops=6):
    df = spark.createDataFrame(edges, "src string, dst string, ts timestamp")
    out = temporal_reachability(df, sources, "src", "dst", "ts", max_hops=hops)
    return sorted((r["node"], r["earliest_arrival"]) for r in out.collect())


def duck(edges, sources, hops=6):
    vals = ",".join(f"('{a}','{b}',TIMESTAMP '{t}')" for a, b, t in edges)
    sql = temporal_reachability_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst, ts)", sources, hops
    )
    return sorted(duckdb.sql(sql).fetchall())


def test_waiting_and_ordering(spark):
    """b->d fires BEFORE the walker reaches b: unusable.  The later
    direct a->d edge is the real earliest arrival."""
    edges = [
        ("a", "b", T(1)), ("b", "c", T(2)), ("b", "d", T(0)),
        ("a", "d", T(5)), ("c", "e", T(3)), ("e", "b", T(0)),
    ]
    got = run(spark, edges, ["a"])
    assert got == sorted(
        [("a", None), ("b", T(1)), ("c", T(2)), ("d", T(5)), ("e", T(3))]
    )


def test_static_reachable_but_temporally_not(spark):
    """a->b@5 then b->c@1: statically a reaches c, temporally never."""
    edges = [("a", "b", T(5)), ("b", "c", T(1))]
    got = run(spark, edges, ["a"])
    assert got == sorted([("a", None), ("b", T(5))])


def test_equal_time_transfer_allowed(spark):
    """arrival(u) <= t is inclusive: same-instant transfer works."""
    edges = [("a", "b", T(2)), ("b", "c", T(2))]
    got = run(spark, edges, ["a"])
    assert got == sorted([("a", None), ("b", T(2)), ("c", T(2))])


def test_max_hops_truncates(spark):
    edges = [(f"n{i}", f"n{i + 1}", T(i)) for i in range(5)]
    got = run(spark, edges, ["n0"], hops=2)
    assert [n for n, _ in got] == ["n0", "n1", "n2"]


def test_multi_seed_min(spark):
    """Two seeds: each node takes the earliest arrival over both."""
    edges = [("a", "x", T(4)), ("b", "x", T(2))]
    got = run(spark, edges, ["a", "b"])
    assert ("x", T(2)) in got


def test_duckdb_parity_dense(spark):
    edges = [
        (f"u{(3 * i) % 9}", f"u{(5 * i + 1) % 9}", T((7 * i) % 24))
        for i in range(40)
    ]
    edges = [(a, b, t) for a, b, t in edges if a != b]
    got = run(spark, edges, ["u0", "u4"], hops=5)
    assert got == duck(edges, ["u0", "u4"], 5)


def test_validation(spark):
    df = spark.createDataFrame([("a", "b", T(0))], "src string, dst string, ts timestamp")
    with pytest.raises(ValueError, match="source"):
        temporal_reachability(df, [], "src", "dst", "ts")
