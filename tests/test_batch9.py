"""Round-5 batch 9: OLS, session entry/exit, k-anonymity, quarantine."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.regression import ols2
from polars_grouper_spark.functions.scrub import k_anonymity_violations
from polars_grouper_spark.functions.validate import quarantine
from polars_grouper_spark.operators.sequences import session_entry_exit


def test_ols2_recovers_planted_coefficients(spark):
    rng = random.Random(3)
    rows = []
    for _ in range(300):
        x1 = rng.randint(0, 50)
        x2 = rng.randint(0, 10) / 10.0
        y = 5.0 + 2.0 * x1 - 3.0 * x2  # exact plane, no noise
        rows.append((float(x1), x2, y))
    df = spark.createDataFrame(rows, ["x1", "x2", "y"])
    r = ols2(df, "x1", "x2", "y", q1=1, q2=10, qy=10).collect()[0]
    assert r.b0 == pytest.approx(5.0, abs=1e-6)
    assert r.b1 == pytest.approx(2.0, abs=1e-9)
    assert r.b2 == pytest.approx(-3.0, abs=1e-6)
    assert r.r2 == pytest.approx(1.0, abs=1e-9)


def test_ols2_matches_numpy_lstsq(spark):
    import numpy as np

    rng = random.Random(4)
    rows = [
        (
            float(rng.randint(0, 20)),
            float(rng.randint(0, 5)),
            float(rng.randint(0, 100)),
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, ["x1", "x2", "y"])
    r = ols2(df, "x1", "x2", "y").collect()[0]
    a = np.array([[1.0, x1, x2] for x1, x2, _ in rows])
    b = np.array([y for *_, y in rows])
    coef, *_ = np.linalg.lstsq(a, b, rcond=None)
    assert r.b0 == pytest.approx(coef[0], rel=1e-6)
    assert r.b1 == pytest.approx(coef[1], rel=1e-6)
    assert r.b2 == pytest.approx(coef[2], rel=1e-6)


def test_ols2_collinear_returns_nulls(spark):
    df = spark.createDataFrame(
        [(float(i), float(2 * i), float(i)) for i in range(20)],
        ["x1", "x2", "y"],
    )
    r = ols2(df, "x1", "x2", "y").collect()[0]
    assert r.b0 is None and r.b1 is None and r.r2 is None
    assert r.n == 20


def test_session_entry_exit_basic(spark):
    rows = [
        # user 1: two sessions -- [a, b] then (gap > 30m) [c]
        (1, 0, "a", 1),
        (1, 600, "b", 2),
        (1, 60_000, "c", 3),
        # user 2: bounce [x]
        (2, 0, "x", 4),
    ]
    df = spark.createDataFrame(rows, ["u", "t", "et", "eid"]).select(
        "u", F.col("t").cast("timestamp").alias("ts"), "et", "eid"
    )
    out = {
        (r.entry_type, r.exit_type): r
        for r in session_entry_exit(df, "u", "ts", "et", "eid").collect()
    }
    assert out[("a", "b")].n_sessions == 1 and out[("a", "b")].n_bounces == 0
    assert out[("c", "c")].n_bounces == 1
    assert out[("x", "x")].n_bounces == 1


def test_session_entry_exit_tie_ordering(spark):
    # same timestamp: eid breaks the tie for entry/exit
    rows = [(1, 0, "late", 9), (1, 0, "early", 1)]
    df = spark.createDataFrame(rows, ["u", "t", "et", "eid"]).select(
        "u", F.col("t").cast("timestamp").alias("ts"), "et", "eid"
    )
    r = session_entry_exit(df, "u", "ts", "et", "eid").collect()[0]
    assert (r.entry_type, r.exit_type) == ("early", "late")


def test_kanon_flags_small_groups_only(spark):
    rows = [("us", "a")] * 10 + [("us", "b")] * 2 + [("de", "a")] * 4
    df = spark.createDataFrame(rows, ["country", "seg"])
    out = {
        (r.country, r.seg): r.n_rows
        for r in k_anonymity_violations(df, ["country", "seg"], k=5).collect()
    }
    assert out == {("us", "b"): 2, ("de", "a"): 4}


def test_kanon_rejects_bad_args(spark):
    df = spark.createDataFrame([("a",)], ["c"])
    with pytest.raises(ValueError):
        k_anonymity_violations(df, ["c"], k=1)
    with pytest.raises(ValueError):
        k_anonymity_violations(df, [], k=5)


def test_quarantine_reasons_in_rule_order(spark):
    df = spark.createDataFrame(
        [(1, 10, "x"), (2, 1000, "bad"), (3, 5, "bad"), (4, 1, "ok")],
        ["id", "amount", "tag"],
    )
    out = {
        r.id: r.reasons
        for r in quarantine(
            df,
            [
                ("too_big", F.col("amount") > 100),
                ("bad_tag", F.col("tag") == "bad"),
            ],
            "id",
        ).collect()
    }
    assert out == {2: "too_big,bad_tag", 3: "bad_tag"}


def test_quarantine_requires_rules(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError):
        quarantine(df, [], "id")
