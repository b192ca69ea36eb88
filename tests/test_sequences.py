"""Precedence-pair sequence mining (operators/sequences.py)."""

import datetime as dt

import duckdb

from polars_grouper_spark.operators.sequences import (
    precedence_pairs,
    precedence_pairs_sql,
)


def _t(h):
    return dt.datetime(2024, 3, 1) + dt.timedelta(hours=h)


def test_precedence_hand_computed(spark):
    rows = [
        (1, _t(0), "view"), (1, _t(1), "cart"), (1, _t(2), "buy"),
        (2, _t(0), "cart"), (2, _t(1), "view"),      # cart before view only
        (3, _t(0), "view"),                           # single type: no pairs
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        (r["etype_a"], r["etype_b"]): (r["n_users"], r["support_pct"])
        for r in precedence_pairs(df).collect()
    }
    assert got == {
        ("view", "cart"): (1, round(1 / 3, 6)),
        ("view", "buy"): (1, round(1 / 3, 6)),
        ("cart", "buy"): (1, round(1 / 3, 6)),
        ("cart", "view"): (1, round(1 / 3, 6)),
    }


def test_precedence_strictness_and_nulls(spark):
    # equal timestamps are NOT "before"; null fields drop
    rows = [
        (1, _t(0), "a"), (1, _t(0), "b"),
        (2, None, "a"), (None, _t(1), "b"), (2, _t(2), None),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    assert precedence_pairs(df).count() == 0


def test_precedence_matches_duckdb_random(spark):
    import random

    random.seed(3)
    rows = [
        (random.randint(1, 30), _t(random.randint(0, 50)),
         random.choice(["a", "b", "c", "d"]))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = sorted(tuple(r) for r in precedence_pairs(df).collect())
    vals = ", ".join(
        f"({u}, TIMESTAMP '{ts}', '{t}')" for u, ts, t in rows
    )
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            precedence_pairs_sql(f"SELECT * FROM (VALUES {vals}) t(u, ts, t)")
        ).fetchall()
    )
    assert len(got) > 0 and got == want
