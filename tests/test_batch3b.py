"""Round-5 batch 3b: CMS inner product, streaming top-k, FD audit."""

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.sketches import cms_counts, cms_inner_product
from polars_grouper_spark.functions.validate import fd_audit
from polars_grouper_spark.streaming.windows import topk_per_window, windowed_counts


def test_cms_inner_product_overestimates_and_is_close(spark):
    left = spark.createDataFrame(
        [(i % 20,) for i in range(1000)], "k long"
    )
    right = spark.createDataFrame([(i,) for i in range(40)], "k long")
    est = cms_inner_product(
        cms_counts(left, "k", width_bits=12),
        cms_counts(right, "k", width_bits=12),
    ).collect()[0]["est_join_size"]
    true_size = left.join(right, "k").count()  # 1000 (keys 0..19 hit once)
    assert est >= true_size
    # width 4096 >> key count: collisions negligible, estimate exact-ish
    assert est <= true_size * 1.05


def test_cms_inner_product_disjoint_keys_is_zero(spark):
    a = spark.createDataFrame([(i,) for i in range(50)], "k long")
    b = spark.createDataFrame([(1000 + i,) for i in range(50)], "k long")
    est = cms_inner_product(
        cms_counts(a, "k", width_bits=14), cms_counts(b, "k", width_bits=14)
    ).collect()[0]["est_join_size"]
    # wide sketch -> few collisions; a collision adds 1 per colliding pair
    assert est <= 3


def test_cms_inner_product_depth_mismatch_raises(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([(1,), (2,)], "k long")
    with pytest.raises((SparkRuntimeException, Exception), match="depth mismatch"):
        cms_inner_product(
            cms_counts(df, "k", depth=4), cms_counts(df, "k", depth=2)
        ).collect()


def test_cms_inner_product_empty_side_is_zero(spark):
    df = spark.createDataFrame([(1,), (2,)], "k long")
    empty = spark.createDataFrame([], "k long")
    est = cms_inner_product(
        cms_counts(df, "k"), cms_counts(empty, "k")
    ).collect()[0]["est_join_size"]
    assert est == 0


def test_topk_per_window_deterministic_ties(spark):
    rows = [
        (0, "a", 5),
        (0, "b", 5),  # tie with a -> a first (key asc)
        (0, "c", 9),
        (1, "z", 1),
    ]
    counts = spark.createDataFrame(rows, "window_start long, key string, n long")
    got = [
        (r["window_start"], r["key"], r["rank"])
        for r in topk_per_window(counts, k=2).orderBy("window_start", "rank").collect()
    ]
    assert got == [(0, "c", 1), (0, "a", 2), (1, "z", 1)]
    with pytest.raises(ValueError):
        topk_per_window(counts, k=0)


def test_windowed_counts_batch_matches_manual(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:10:00", "x"), ("2024-01-01 00:50:00", "x"),
         ("2024-01-01 01:10:00", "y")],
        "ts string, event_type string",
    ).select(F.to_timestamp("ts").alias("ts"), "event_type")
    got = {
        (r["window_start"].isoformat(), r["key"]): r["n"]
        for r in windowed_counts(df, window_duration="1 hour").collect()
    }
    assert got == {
        ("2024-01-01T00:00:00", "x"): 2,
        ("2024-01-01T01:00:00", "y"): 1,
    }


def test_fd_audit_holding_and_violating(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (3, "c"), (3, "d"), (None, "x")],
        "k long, v string",
    )
    row = fd_audit(df, ["k"], "v").collect()[0]
    assert row["n_groups"] == 3  # null determinant excluded
    assert row["n_violating_groups"] == 1
    assert row["fd_holds"] is False
    assert row["sample_keys"] == "3"
    ok = fd_audit(df.where("k IS NOT NULL AND k <> 3"), ["k"], "v").collect()[0]
    assert ok["fd_holds"] is True and ok["sample_keys"] == ""


def test_fd_audit_null_dependent_counts_as_value(spark):
    df = spark.createDataFrame([(1, "a"), (1, None)], "k long, v string")
    row = fd_audit(df, ["k"], "v").collect()[0]
    assert row["n_violating_groups"] == 1
