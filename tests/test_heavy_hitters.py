"""Two-phase exact heavy hitters: superset guarantee + exact output."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.heavy_hitters import (
    heavy_hitter_candidates,
    heavy_hitters,
)


def _skewed(spark, n_hot=400, n_cold=600):
    # 2 hot keys (20%/20%), the rest a long unique tail.
    rows = (
        [("hot_a",)] * n_hot
        + [("hot_b",)] * n_hot
        + [(f"cold_{i}",) for i in range(n_cold)]
    )
    return spark.createDataFrame(rows, "item string").repartition(4)


def test_exact_output_matches_bruteforce(spark):
    df = _skewed(spark)
    got = {
        r["item"]: (r["cnt"], r["share"])
        for r in heavy_hitters(df, "item", 0.1).collect()
    }
    n = df.count()
    exact = {
        r["item"]: r["cnt"]
        for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("cnt")).collect()
        if r["cnt"] > 0.1 * n
    }
    assert set(got) == set(exact)
    for k, cnt in exact.items():
        assert got[k][0] == cnt
        assert got[k][1] == pytest.approx(cnt / n, abs=1e-9)


def test_candidates_are_superset_of_true_hitters(spark):
    df = _skewed(spark, n_hot=300, n_cold=900)
    n = df.count()
    true_hot = {
        r["item"]
        for r in df.groupBy("item").count().where(F.col("count") > 0.15 * n).collect()
    }
    cands = {r["item"] for r in heavy_hitter_candidates(df, "item", 0.15).collect()}
    assert true_hot <= cands


def test_threshold_is_strict_and_nulls_drop(spark):
    # 4 rows: two 'a', one 'b', one null -> n=3 non-null; share(a)=2/3.
    df = spark.createDataFrame([("a",), ("a",), ("b",), (None,)], "item string")
    out = heavy_hitters(df, "item", 0.5).collect()
    assert [(r["item"], r["cnt"]) for r in out] == [("a", 2)]
    # exactly-at-threshold excluded: share(a)=0.5 with min_share=0.5... use b
    out2 = {r["item"] for r in heavy_hitters(df, "item", 1 / 3).collect()}
    assert out2 == {"a"}  # b is exactly 1/3, strict > excludes it


def test_adversarial_spread_still_found(spark):
    # A key at 30% global share spread evenly across many partitions —
    # the pigeonhole argument says it must exceed 30% in some batch.
    rows = [("hh",)] * 300 + [(f"u{i}",) for i in range(700)]
    df = spark.createDataFrame(rows, "item string").repartition(8)
    got = {r["item"] for r in heavy_hitters(df, "item", 0.25).collect()}
    assert got == {"hh"}


def test_min_share_validation(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "item", 0.0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "item", 1.0)
