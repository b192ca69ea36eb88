"""Round-5 batch 26: cohort LTV, regression reliability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.operators.funnel import cohort_ltv


def test_cohort_ltv_bruteforce(spark):
    day = 86400
    rows = [
        # customer 1: first purchase period 0, buys again period 1
        (1, 0 * day, 100.0),
        (1, 30 * day, 50.0),
        # customer 2: same cohort (period 0), single purchase
        (2, 5 * day, 10.0),
        # customer 3: cohort period 2
        (3, 60 * day, 70.0),
    ]
    df = spark.createDataFrame(rows, ["key", "t", "amount"]).select(
        "key", F.col("t").cast("timestamp").alias("ts"), "amount"
    )
    out = {(r.cohort, r.age): r for r in
           cohort_ltv(df, "key", "ts", "amount", period_days=28).collect()}
    c0 = [k for k in out if out[k].n_cohort == 2][0][0]
    assert out[(c0, 0)].revenue == pytest.approx(110.0)
    assert out[(c0, 0)].cum_ltv == pytest.approx(55.0)
    assert out[(c0, 1)].revenue == pytest.approx(50.0)
    assert out[(c0, 1)].cum_ltv == pytest.approx(80.0)  # (110+50)/2
    c2 = [k for k in out if out[k].n_cohort == 1][0][0]
    assert out[(c2, 0)].cum_ltv == pytest.approx(70.0)


def test_cohort_ltv_max_offset_caps(spark):
    day = 86400
    rows = [(1, 0, 10.0), (1, 400 * day, 10.0)]
    df = spark.createDataFrame(rows, ["key", "t", "amount"]).select(
        "key", F.col("t").cast("timestamp").alias("ts"), "amount"
    )
    ages = {r.age for r in
            cohort_ltv(df, "key", "ts", "amount",
                       period_days=28, max_offset=3).collect()}
    assert ages == {0}  # the 400-day repeat falls past the cap


def test_cohort_ltv_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "2020-01-01", 1.0)], ["k", "ts", "a"])
    with pytest.raises(ValueError):
        cohort_ltv(df, "k", "ts", "a", period_days=0)
    with pytest.raises(ValueError):
        cohort_ltv(df, "k", "ts", "a", max_offset=-1)


def test_reg_reliability_monotone_on_fixture(spark):
    import __spark_entry__ as em

    rows = em.queries()["reg_reliability"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert sum(r.n for r in rows) == 6000  # sf0.001 lineitem rows
    # predictions rise with bin by construction; actuals track them
    preds = [r.mean_pred for r in sorted(rows, key=lambda r: r.bin)]
    assert preds == sorted(preds)
