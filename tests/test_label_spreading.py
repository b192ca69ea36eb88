"""Label spreading — clamped seeds, deterministic tie-breaks, round
semantics, DuckDB replay parity."""

import duckdb

from polars_grouper_spark.operators.label_spreading import (
    label_spreading,
    label_spreading_sql,
)


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def run_duck(edges, seeds, rounds, directed=False):
    ev = ",".join(f"('{a}','{b}')" for a, b in edges)
    sv = ",".join(f"('{n}','{l}')" for n, l in seeds)
    sql = label_spreading_sql(
        f"SELECT * FROM (VALUES {ev}) t(src, dst)",
        f"SELECT * FROM (VALUES {sv}) t(node, label)",
        rounds,
        directed,
    )
    return sorted(tuple(r) for r in duckdb.sql(sql).fetchall())


def test_chain_spread(spark):
    """Seed at one end of a path: the label walks one hop per round."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["from", "to"]
    )
    seeds = spark.createDataFrame([("a", "L")], ["node", "label"])
    one = rows(label_spreading(edges, seeds, rounds=1))
    assert one == [("a", "L"), ("b", "L")]
    three = rows(label_spreading(edges, seeds, rounds=3))
    assert three == [("a", "L"), ("b", "L"), ("c", "L"), ("d", "L")]


def test_seeds_clamped(spark):
    """A seed surrounded by the other label keeps its own."""
    edges = spark.createDataFrame(
        [("s", "x"), ("x", "t"), ("s", "t")], ["from", "to"]
    )
    seeds = spark.createDataFrame([("s", "A"), ("t", "B")], ["node", "label"])
    got = dict(rows(label_spreading(edges, seeds, rounds=4)))
    assert got["s"] == "A" and got["t"] == "B"
    assert got["x"] in {"A", "B"}  # tie broken deterministically
    assert got["x"] == "A"  # (1 vote each -> label asc)


def test_majority_wins(spark):
    edges = spark.createDataFrame(
        [("a1", "x"), ("a2", "x"), ("b1", "x")], ["from", "to"]
    )
    seeds = spark.createDataFrame(
        [("a1", "A"), ("a2", "A"), ("b1", "B")], ["node", "label"]
    )
    got = dict(rows(label_spreading(edges, seeds, rounds=1)))
    assert got["x"] == "A"


def test_zero_rounds_is_seeds(spark):
    edges = spark.createDataFrame([("a", "b")], ["from", "to"])
    seeds = spark.createDataFrame([("a", "L")], ["node", "label"])
    assert rows(label_spreading(edges, seeds, rounds=0)) == [("a", "L")]


def test_directed_respects_direction(spark):
    edges = spark.createDataFrame([("a", "b")], ["from", "to"])
    seeds = spark.createDataFrame([("b", "L")], ["node", "label"])
    got = rows(label_spreading(edges, seeds, rounds=2, directed=True))
    assert got == [("b", "L")]  # no edge INTO a from b's side? a->b only
    got_undirected = rows(label_spreading(edges, seeds, rounds=2))
    assert got_undirected == [("a", "L"), ("b", "L")]


def test_duckdb_replay_parity(spark):
    edges = [(f"n{(3 * i) % 17}", f"n{(7 * i + 2) % 17}") for i in range(40)]
    edges = [(a, b) for a, b in edges if a != b]
    seeds = [("n0", "alpha"), ("n5", "beta"), ("n11", "gamma")]
    sdf = spark.createDataFrame(edges, ["from", "to"])
    seed_df = spark.createDataFrame(seeds, ["node", "label"])
    got = rows(label_spreading(sdf, seed_df, rounds=4))
    assert got == run_duck(edges, seeds, 4)


def test_duckdb_replay_parity_directed(spark):
    edges = [(f"m{(5 * i) % 13}", f"m{(11 * i + 1) % 13}") for i in range(30)]
    edges = [(a, b) for a, b in edges if a != b]
    seeds = [("m1", "x"), ("m2", "y")]
    sdf = spark.createDataFrame(edges, ["from", "to"])
    seed_df = spark.createDataFrame(seeds, ["node", "label"])
    got = rows(label_spreading(sdf, seed_df, rounds=3, directed=True))
    assert got == run_duck(edges, seeds, 3, directed=True)
