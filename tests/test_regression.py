"""Per-group OLS trend fit (functions/regression.py)."""

import duckdb

from polars_grouper_spark.functions.regression import group_trend, group_trend_sql


def test_trend_exact_line(spark):
    rows = [("g", x, 3 * x + 7) for x in range(10)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    r = group_trend(df, "grp", "x", "y").collect()[0]
    assert (r["slope"], r["intercept"], r["n"]) == (3.0, 7.0, 10)


def test_trend_degenerate_groups_null_not_dropped(spark):
    rows = [("single", 1, 5), ("flatx", 2, 1), ("flatx", 2, 9)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    got = {r["grp"]: (r["n"], r["slope"], r["intercept"])
           for r in group_trend(df, "grp", "x", "y").collect()}
    assert got == {"single": (1, None, None), "flatx": (2, None, None)}


def test_trend_moments_merge_like_incremental_state(spark):
    """fit(A u B) == fit over union — moments are order-independent
    integer sums, so computing over any split agrees exactly."""
    import random

    random.seed(8)
    rows = [("g", x, 50 + 2 * x + random.randint(-5, 5)) for x in range(100)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    whole = group_trend(df, "grp", "x", "y").collect()[0]
    shuffled = group_trend(df.repartition(17), "grp", "x", "y").collect()[0]
    assert tuple(whole) == tuple(shuffled)


def test_trend_matches_duckdb(spark):
    import random

    random.seed(31)
    rows = [
        (f"g{i % 5}", i % 30, random.randint(0, 1000)) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    got = sorted(map(tuple, group_trend(df, "grp", "x", "y").collect()))
    vals = ", ".join(f"('{g}',{x},{y})" for g, x, y in rows)
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            group_trend_sql(f"SELECT * FROM (VALUES {vals}) t(grp, x, y)")
        ).fetchall()
    )
    assert got == want
