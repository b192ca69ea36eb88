"""Kaplan-Meier survival (functions/survival.py)."""

import duckdb
import pytest

from polars_grouper_spark.functions.survival import kaplan_meier, kaplan_meier_sql


def test_km_textbook_example(spark):
    # durations: deaths at 1 (n=5 -> S=4/5), censor at 2,
    # death at 3 (n=3 -> S=4/5 * 2/3), censor at 4, death at 5 (n=1 -> 0)
    rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 1)]
    df = spark.createDataFrame(rows, "t long, obs int")
    got = {r["t"]: (r["n_risk"], r["n_death"], r["survival"])
           for r in kaplan_meier(df, "t", "obs").collect()}
    assert got[1] == (5, 1, round(4 / 5, 6))
    assert got[2] == (4, 0, round(4 / 5, 6))          # censor: level unchanged
    assert got[3] == (3, 1, round(4 / 5 * 2 / 3, 6))
    assert got[5] == (1, 1, 0.0)                      # everyone at risk dies


def test_km_censoring_matters(spark):
    """Treating censored subjects as deaths (the naive estimate) must
    differ — the whole point of the estimator."""
    rows = [(2, 1)] * 5 + [(2, 0)] * 5
    df = spark.createDataFrame(rows, "t long, obs int")
    r = kaplan_meier(df, "t", "obs").collect()[0]
    assert r["survival"] == 0.5           # 5 of 10 at risk die
    naive_all_die = 0.0
    assert r["survival"] != naive_all_die


def test_km_survival_monotone_nonincreasing(spark):
    import random

    random.seed(12)
    rows = [(random.randint(1, 20), random.randint(0, 1)) for _ in range(300)]
    df = spark.createDataFrame(rows, "t long, obs int")
    curve = [r["survival"] for r in
             kaplan_meier(df, "t", "obs").orderBy("t").collect()]
    assert all(a >= b for a, b in zip(curve, curve[1:]))


def test_km_matches_duckdb(spark):
    import random

    random.seed(19)
    rows = [(random.randint(1, 15), random.randint(0, 1)) for _ in range(200)]
    df = spark.createDataFrame(rows, "t long, obs int")
    got = sorted(map(tuple, kaplan_meier(df, "t", "obs").collect()))
    vals = ", ".join(f"({t},{o})" for t, o in rows)
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            kaplan_meier_sql(f"SELECT * FROM (VALUES {vals}) t(t, obs)")
        ).fetchall()
    )
    assert got == want
