"""Drift detection: PSI + term shift (functions/drift.py)."""

import duckdb
import pytest

from polars_grouper_spark.functions.drift import (
    psi_drift,
    psi_drift_sql,
    term_drift,
    term_drift_sql,
)


def test_psi_zero_for_identical_distributions(spark):
    df = spark.createDataFrame([(float(i % 50),) for i in range(500)], ["v"])
    out = psi_drift(df, df, "v", lo=0.0, hi=50.0, bins=10).collect()
    total = [r for r in out if r["bucket"] == -1][0]
    assert total["contrib"] == 0.0
    assert len(out) == 11  # 10 buckets + total


def test_psi_detects_shift_and_matches_duckdb(spark):
    a_vals = [float(i % 40) for i in range(400)]          # uniform 0..40
    b_vals = [float(i % 40) + 30.0 for i in range(400)]   # shifted +30
    a = spark.createDataFrame([(v,) for v in a_vals], ["v"])
    b = spark.createDataFrame([(v,) for v in b_vals], ["v"])
    out = psi_drift(a, b, "v", lo=0.0, hi=80.0, bins=16).collect()
    total = [r for r in out if r["bucket"] == -1][0]
    assert total["contrib"] > 0.25  # "action" threshold for a gross shift
    got = sorted(map(tuple, out))
    va = ", ".join(f"({v})" for v in a_vals)
    vb = ", ".join(f"({v})" for v in b_vals)
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            psi_drift_sql(
                f"SELECT * FROM (VALUES {va}) t(value)",
                f"SELECT * FROM (VALUES {vb}) t(value)",
                "value",
                lo=0.0,
                hi=80.0,
                bins=16,
            )
        ).fetchall()
    )
    assert got == want


def test_term_drift_directions_and_integer_threshold(spark):
    a = spark.createDataFrame(
        [("old stable common",)] * 10 + [("stable common",)] * 10, ["text"]
    )
    b = spark.createDataFrame(
        [("new stable common",)] * 10 + [("stable common",)] * 10, ["text"]
    )
    got = {r["token"]: r["direction"] for r in
           term_drift(a, b, "text", ratio_num=2, ratio_den=1, min_docs=5).collect()}
    # 'old': 10 -> 0 docs (down, 11/1 > 2); 'new': 0 -> 10 (up);
    # 'stable'/'common': unchanged, excluded
    assert got == {"old": "down", "new": "up"}


def test_term_drift_no_organic_drift_is_empty(spark):
    docs = [(f"alpha beta gamma d{i % 7}",) for i in range(50)]
    df = spark.createDataFrame(docs, ["text"])
    assert term_drift(df, df, "text", min_docs=1).count() == 0


def test_psi_bins_validation(spark):
    df = spark.createDataFrame([(1.0,)], ["v"])
    with pytest.raises(ValueError, match="bins"):
        psi_drift(df, df, "v", lo=0.0, hi=1.0, bins=1)
