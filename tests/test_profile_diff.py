"""Round-4 batch 5: one-pass profiling and snapshot-diff CDC."""

import duckdb
import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.profile import profile_table, profile_table_sql
from polars_grouper_spark.operators.snapshot_diff import (
    snapshot_diff,
    snapshot_diff_sql,
)


def test_profile_counts_nulls_and_ranges(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, None, 7.5), (4, "b", None)],
        "id long, s string, v double",
    )
    got = {r["column"]: r for r in profile_table(df, ["id", "s", "v"]).collect()}
    assert got["id"]["n_nulls"] == 0 and got["id"]["null_rate"] == 0.0
    assert got["s"]["n_nulls"] == 1 and got["s"]["null_rate"] == 0.25
    assert got["v"]["n_nulls"] == 2
    assert (got["id"]["min_str"], got["id"]["max_str"]) == ("1", "4")
    assert abs(got["s"]["approx_distinct"] - 2.0) < 0.01  # linear-counting regime


def test_profile_duckdb_parity(spark):
    rows = [(i, f"s{i % 7}", float(i % 11) if i % 5 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    got = sorted(tuple(r) for r in profile_table(df, ["id", "s", "v"]).collect())
    vals = ",".join(
        "({}, '{}', {})".format(i, s, "NULL" if v is None else repr(v))
        for i, s, v in rows
    )
    sql = profile_table_sql(
        f"(SELECT * FROM (VALUES {vals}) t(id, s, v))", ["id", "s", "v"]
    )
    want = sorted(duckdb.sql(sql).fetchall())
    assert got == want


def test_profile_validation(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(ValueError, match="at least one column"):
        profile_table(df, [])


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "k long, s string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, "c", 30), (5, "e", 50)],
        "k long, s string, v int",
    )
    got = {r["k"]: (r["change"], r["n_diff_cols"]) for r in
           snapshot_diff(old, new, ["k"], ["s", "v"]).collect()}
    assert got[2] == ("changed", 1)   # s differs
    assert got[3] == ("changed", 1)   # NULL -> 30 is a change (null-safe)
    assert got[4] == ("removed", 0)
    assert got[5] == ("added", 0)
    assert 1 not in got               # unchanged suppressed by default
    full = {r["k"]: r["change"] for r in
            snapshot_diff(old, new, ["k"], ["s", "v"], include_unchanged=True).collect()}
    assert full[1] == "unchanged"


def test_snapshot_diff_duckdb_parity(spark):
    old_rows = [(i, f"v{i % 5}") for i in range(60)]
    new_rows = [(i, f"v{(i % 5) + (1 if i % 7 == 0 else 0)}") for i in range(3, 70)]
    old = spark.createDataFrame(old_rows, "k long, s string")
    new = spark.createDataFrame(new_rows, "k long, s string")
    got = sorted(tuple(r) for r in snapshot_diff(old, new, ["k"], ["s"]).collect())
    ov = ",".join(f"({k}, '{s}')" for k, s in old_rows)
    nv = ",".join(f"({k}, '{s}')" for k, s in new_rows)
    sql = snapshot_diff_sql(
        f"SELECT * FROM (VALUES {ov}) t(k, s)",
        f"SELECT * FROM (VALUES {nv}) t(k, s)",
        ["k"], ["s"],
    )
    want = sorted(duckdb.sql(sql).fetchall())
    assert got == want


def test_scd2_history_hand_computed(spark):
    """Runs collapse on change, reopen on revert (v5 returns to 'a' but
    starts a NEW row — SCD2 history, not a distinct-values table)."""
    from polars_grouper_spark.operators.snapshot_diff import scd2_history

    rows = [
        ("k", 1, "a"), ("k", 2, "a"), ("k", 3, "b"),
        ("k", 4, "b"), ("k", 5, "a"),
        ("j", 1, "x"),
    ]
    df = spark.createDataFrame(rows, "key string, v long, attr string")
    got = sorted(
        (r["key"], r["attr"], r["valid_from"], r["valid_to"], r["n_versions"])
        for r in scd2_history(df, ["key"], ["attr"], "v").collect()
    )
    assert got == [
        ("j", "x", 1, 1, 1),
        ("k", "a", 1, 2, 2),
        ("k", "a", 5, 5, 1),
        ("k", "b", 3, 4, 2),
    ]


def test_scd2_null_attrs_null_safe(spark):
    from polars_grouper_spark.operators.snapshot_diff import scd2_history

    rows = [("k", 1, None), ("k", 2, None), ("k", 3, "a"), ("k", 4, None)]
    df = spark.createDataFrame(rows, "key string, v long, attr string")
    got = sorted(
        (r["valid_from"], r["valid_to"], r["attr"])
        for r in scd2_history(df, ["key"], ["attr"], "v").collect()
    )
    # NULL vs NULL is "unchanged"; NULL vs value is a change
    assert got == [(1, 2, None), (3, 3, "a"), (4, 4, None)]
