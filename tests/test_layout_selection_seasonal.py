"""clustering_report / budget_select / seasonal_profile invariants."""

import datetime as dt

from pyspark.sql import functions as F

from polars_grouper_spark.functions.selection import budget_select
from polars_grouper_spark.functions.timeseries import seasonal_profile
from polars_grouper_spark.plans.layout import clustering_report


def test_clustering_report_sorted_layout_no_overlap(spark):
    # stat == sort key, distinct values -> files have disjoint ranges
    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    rep = clustering_report(df, ["k"], "k", 25).collect()
    assert len(rep) == 4
    assert all(r["n_overlap"] == 1 and r["n"] == 25 for r in rep)


def test_clustering_report_shuffled_layout_full_overlap(spark):
    # sort on an unrelated interleaving key -> every file spans the range
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(100)], "k long, other long"
    )
    rep = clustering_report(df, ["other", "k"], "k", 25).collect()
    assert len(rep) == 4
    assert all(r["n_overlap"] == 4 for r in rep)


def test_budget_select_matches_plain_cumsum(spark):
    rows = [(i, ((i * 37) % 100) / 100.0, 10 + (i * 13) % 50) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, score double, cost long")
    for budget in (0, 500, 3_000, 10**9):
        pruned = budget_select(
            df, "id", "score", "cost", budget, coarse_buckets=16
        )
        plain = budget_select(
            df, "id", "score", "cost", budget, coarse_buckets=None
        )
        a = sorted(map(tuple, pruned.collect()))
        b = sorted(map(tuple, plain.collect()))
        assert a == b
        if a:
            assert max(r[3] for r in a) <= budget


def test_budget_select_zero_cost_boundary(spark):
    # zero-cost rows landing exactly on the budget must survive pruning
    rows = [(1, 0.9, 5), (2, 0.5, 0), (3, 0.4, 0), (4, 0.1, 7)]
    df = spark.createDataFrame(rows, "id long, score double, cost long")
    got = sorted(
        r["id"]
        for r in budget_select(
            df, "id", "score", "cost", 5, coarse_buckets=4
        ).collect()
    )
    assert got == [1, 2, 3]


def test_seasonal_profile_identity_and_effect_sums(spark):
    base = dt.datetime(2024, 1, 1)  # a Monday
    rows = []
    for day in range(14):
        for hour in (3, 12, 20):
            ts = base + dt.timedelta(days=day, hours=hour)
            v = 10.0 + (ts.weekday() * 2.0) + (0.5 * hour) + (day % 3) * 0.25
            rows.append((ts, v))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    prof = seasonal_profile(df, "ts", "value").collect()
    assert len(prof) == 21  # 7 dows x 3 hours
    # decomposition identity holds per cell by construction
    overall = sum(r["n"] * r["cell_mean"] for r in prof) / sum(
        r["n"] for r in prof
    )
    for r in prof:
        recon = overall + r["dow_effect"] + r["hour_effect"] + r["residual"]
        assert abs(recon - r["cell_mean"]) < 1e-9
    # Monday(0) effect < Sunday(6) effect given the +2/day trend
    mon = next(r for r in prof if r["dow"] == 0 and r["hour"] == 3)
    sun = next(r for r in prof if r["dow"] == 6 and r["hour"] == 3)
    assert mon["dow_effect"] < sun["dow_effect"]


def test_seasonal_profile_weekday_convention(spark):
    # 2024-01-01 is a Monday -> dow 0 under Spark's weekday()
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 5), 1.0)], "ts timestamp, value double"
    )
    r = seasonal_profile(df, "ts", "value").first()
    assert r["dow"] == 0 and r["hour"] == 5


def test_time_weighted_avg_known(spark):
    from polars_grouper_spark.functions.timeseries import time_weighted_avg

    # value 10 held 30s, value 20 held 10s, last obs zero-weight
    rows = [
        ("u", dt.datetime(2024, 1, 1, 0, 0, 0), 10.0),
        ("u", dt.datetime(2024, 1, 1, 0, 0, 30), 20.0),
        ("u", dt.datetime(2024, 1, 1, 0, 0, 40), 99.0),
        ("solo", dt.datetime(2024, 1, 1), 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {r["key"]: r for r in time_weighted_avg(df, "k", "ts", "v").collect()}
    assert got["u"]["total_secs"] == 40
    assert got["u"]["twap"] == (10.0 * 30 + 20.0 * 10) / 40
    assert got["solo"]["twap"] is None and got["solo"]["n_obs"] == 1
