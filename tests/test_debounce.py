"""Greedy debounce (operators/debounce.py)."""

import datetime as dt

import duckdb
import pytest

from polars_grouper_spark.operators.debounce import debounce, debounce_sql

T0 = dt.datetime(2024, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp"
    )


def test_debounce_is_not_sessionize_keep_first(spark):
    """t=0,3,6 with gap 5: session-split keeps only t=0; greedy debounce
    must also keep t=6 (>= 5s after the last KEPT, not the last seen)."""
    df = _df(spark, [
        (1, 1, T0),
        (1, 2, T0 + dt.timedelta(seconds=3)),
        (1, 3, T0 + dt.timedelta(seconds=6)),
    ])
    kept = sorted(r["id"] for r in debounce(df, gap_seconds=5).collect())
    assert kept == [1, 3]


def test_debounce_ties_keep_smallest_id(spark):
    df = _df(spark, [(1, 9, T0), (1, 2, T0), (1, 5, T0)])
    kept = [r["id"] for r in debounce(df, gap_seconds=60).collect()]
    assert kept == [2]


def test_debounce_keys_independent_and_partitioning_invariant(spark):
    rows = [
        (u, u * 100 + i, T0 + dt.timedelta(seconds=30 * i))
        for u in range(1, 6)
        for i in range(10)
    ]
    a = sorted(map(tuple, debounce(_df(spark, rows), gap_seconds=90).collect()))
    b = sorted(
        map(
            tuple,
            debounce(_df(spark, rows).repartition(7), gap_seconds=90).collect(),
        )
    )
    assert a == b
    # each user keeps every 3rd event (30s spacing, 90s gap)
    assert len(a) == 5 * 4


def test_debounce_matches_recursive_oracle(spark):
    import random

    random.seed(4)
    rows = [
        (random.randint(1, 15), i,
         T0 + dt.timedelta(minutes=random.randint(0, 1000)))
        for i in range(300)
    ]
    got = sorted(map(tuple, debounce(_df(spark, rows), gap_seconds=1800).collect()))
    vals = ", ".join(
        f"('{u}', {i}, {int(ts.timestamp() * 1e6)})" for u, i, ts in rows
    )
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            debounce_sql(
                f"SELECT * FROM (VALUES {vals}) t(key, id, ts_us)",
                gap_seconds=1800,
            )
        ).fetchall()
    )
    assert got == want


def test_debounce_gap_validation(spark):
    with pytest.raises(ValueError, match="gap_seconds"):
        debounce(_df(spark, [(1, 1, T0)]), gap_seconds=0)
