"""Declarative expectations gate (functions/validate.py)."""

import pytest

from polars_grouper_spark.functions.validate import validate


def test_validate_counts_each_rule_kind(spark):
    df = spark.createDataFrame(
        [
            (1, "a@x.com", 10.0, 100),
            (2, "bad-email", -5.0, 100),   # regex + range violations
            (2, None, 20.0, 999),          # dup id + null email + missing FK
            (None, "c@x.com", 10.0, 100),  # null id
        ],
        "id long, email string, score double, ref long",
    )
    ref = spark.createDataFrame([(100,), (200,)], "k long")
    got = dict(
        (r["rule"], r["n_violations"])
        for r in validate(
            df,
            not_null=["id", "email"],
            unique=["id"],
            ranges={"score": (0.0, 50.0)},
            regex={"email": r"^[^@]+@[^@]+$"},
            foreign={"ref": (ref, "k")},
        ).collect()
    )
    assert got == {
        "not_null:id": 1,
        "not_null:email": 1,
        "unique:id": 1,       # one row beyond the first occurrence of 2
        "range:score": 1,     # -5.0 (nulls not counted here)
        "regex:email": 1,     # "bad-email" (null not counted here)
        "foreign:ref": 1,     # 999
    }


def test_validate_single_scan_for_row_local_rules(spark):
    """Every non-FK rule must fold into one aggregation over one scan."""
    df = spark.range(100).selectExpr("id", "CAST(id AS STRING) AS s")
    plan = validate(
        df,
        not_null=["id", "s"],
        unique=["id"],
        ranges={"id": (0, 1000)},
        regex={"s": "^[0-9]+$"},
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Range (0, 100") == 1  # one scan of the source


def test_validate_requires_rules(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="no rules"):
        validate(df)
