"""Round-5 batch 15: calendar spine, rendezvous sharding."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.calendar import calendar_dim
from polars_grouper_spark.functions.sampling import rendezvous_assign


def test_calendar_known_dates(spark):
    out = {r.date: r for r in calendar_dim(spark, "2000-02-28", "2000-03-01").collect()}
    # 2000 is a leap year
    assert "2000-02-29" in out
    leap = out["2000-02-29"]
    assert leap.is_month_end and not leap.is_month_start
    assert out["2000-03-01"].is_month_start
    # 2000-02-29 was a Tuesday -> dow 1 (0=Monday)
    assert leap.dow == 1
    assert leap.quarter == 1
    # Feb-start fiscal year: Feb 2000 belongs to FY2001 Q1
    assert leap.fiscal_year == 2001 and leap.fiscal_quarter == 1
    assert out["2000-03-01"].fiscal_quarter == 1


def test_calendar_dow_matches_python(spark):
    rows = calendar_dim(spark, "1999-12-25", "2000-01-05").collect()
    for r in rows:
        d = dt.date.fromisoformat(r.date)
        assert r.dow == d.weekday(), r.date
        assert r.year == d.year and r.month == d.month and r.day == d.day


def test_calendar_fiscal_january(spark):
    # Jan 2000 with Feb fiscal start: FY2000, Q4
    r = calendar_dim(spark, "2000-01-15", "2000-01-15").collect()[0]
    assert r.fiscal_year == 2000 and r.fiscal_quarter == 4


def test_calendar_rejects_bad_range(spark):
    with pytest.raises(ValueError):
        calendar_dim(spark, "2000-01-02", "2000-01-01")
    with pytest.raises(ValueError):
        calendar_dim(spark, "2000-01-01", "2000-01-02", fiscal_start_month=0)


def test_rendezvous_stability_on_removal(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    shards = ["a", "b", "c", "d"]
    a4 = {r.id: r.shard for r in
          rendezvous_assign(df, "doc_id", shards).collect()}
    a3 = {r.id: r.shard for r in
          rendezvous_assign(df, "doc_id", ["a", "b", "d"]).collect()}
    moved = [i for i in a4 if a4[i] != a3[i]]
    # ONLY rows on the removed shard move
    assert all(a4[i] == "c" for i in moved)
    assert set(moved) == {i for i, s in a4.items() if s == "c"}
    # rough balance: every shard gets something
    from collections import Counter

    sizes = Counter(a4.values())
    assert set(sizes) == set(shards)
    assert min(sizes.values()) > 2000 / 4 * 0.7


def test_rendezvous_rejects_bad_shards(spark):
    df = spark.range(5).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        rendezvous_assign(df, "doc_id", [])
    with pytest.raises(ValueError):
        rendezvous_assign(df, "doc_id", ["a", "a"])
    with pytest.raises(ValueError):
        rendezvous_assign(df, "doc_id", [f"s{i}" for i in range(9)])
