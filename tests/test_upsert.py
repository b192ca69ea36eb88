"""Batch MERGE semantics (operators/upsert.py)."""

import pytest

from polars_grouper_spark.operators.upsert import merge_upsert


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, name string, v long",
    )


def test_merge_insert_update_delete(spark):
    ch = spark.createDataFrame(
        [
            (2, "B", 200, "upsert"),   # update
            (3, None, None, "delete"),  # delete
            (4, "d", 40, "upsert"),    # insert
        ],
        "k long, name string, v long, op string",
    )
    got = sorted(map(tuple, merge_upsert(_base(spark), ch, ["k"]).collect()))
    assert got == [(1, "a", 10), (2, "B", 200), (4, "d", 40)]


def test_merge_duplicate_key_in_batch_raises(spark):
    ch = spark.createDataFrame(
        [(2, "B", 200, "upsert"), (2, "BB", 201, "upsert")],
        "k long, name string, v long, op string",
    )
    with pytest.raises(Exception, match="duplicate key"):
        merge_upsert(_base(spark), ch, ["k"]).collect()


def test_merge_unknown_op_raises(spark):
    ch = spark.createDataFrame(
        [(2, "B", 200, "replace")], "k long, name string, v long, op string"
    )
    with pytest.raises(Exception, match="unknown op"):
        merge_upsert(_base(spark), ch, ["k"]).collect()


def test_merge_idempotent_delete_of_absent_key(spark):
    ch = spark.createDataFrame(
        [(99, None, None, "delete")], "k long, name string, v long, op string"
    )
    got = sorted(map(tuple, merge_upsert(_base(spark), ch, ["k"]).collect()))
    assert got == [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
