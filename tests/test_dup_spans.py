"""Cross-document duplicated-span detection."""

import pytest

from polars_grouper_spark.functions.dedup import dup_spans

BOILER = "0123456789" * 6  # 60 chars of shared boilerplate


def _rows(df):
    return {
        r["id"]: (r["n_windows"], r["n_dup_windows"], r["dup_fraction"])
        for r in df.collect()
    }


def test_shared_boilerplate_flagged(spark):
    docs = spark.createDataFrame(
        [
            (1, BOILER + "unique tail one xxxxxxxxxxxxxxxxxxxx"),
            (2, BOILER + "another completely different suffix y"),
            (3, "no overlap with anything else in this doc at all"),
        ],
        ["doc_id", "text"],
    )
    out = _rows(dup_spans(docs, window=20, stride=5))
    # Docs 1 and 2 share the 60-char prefix: windows fully inside it
    # (start <= 41) are identical across docs.
    assert out[1][1] > 0 and out[2][1] > 0
    assert out[3][1] == 0 and out[3][2] == 0.0
    assert 0 < out[1][2] < 1


def test_within_doc_repeat_not_flagged(spark):
    docs = spark.createDataFrame(
        [
            (1, "abcdefghij" * 8),  # heavy self-repetition, no other doc
            (2, "zyxwvutsrq" + "m" * 70),
        ],
        ["doc_id", "text"],
    )
    out = _rows(dup_spans(docs, window=20, stride=5))
    assert out[1][1] == 0  # self-repeats are doc_repetition's job
    assert out[2][1] == 0


def test_short_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "tiny"), (2, "x" * 50), (3, None)], ["doc_id", "text"]
    )
    out = _rows(dup_spans(docs, window=40, stride=10))
    assert set(out) == {2}
    assert out[2][0] == 2  # positions 1 and 11


def test_identical_docs_fully_flagged(spark):
    txt = "the quick brown fox jumps over the lazy dog repeatedly"
    docs = spark.createDataFrame([(1, txt), (2, txt)], ["doc_id", "text"])
    out = _rows(dup_spans(docs, window=20, stride=5))
    assert out[1][2] == 1.0 and out[2][2] == 1.0


def test_validation(spark):
    docs = spark.createDataFrame([(1, "x" * 50)], ["doc_id", "text"])
    with pytest.raises(ValueError):
        dup_spans(docs, window=0)
    with pytest.raises(ValueError):
        dup_spans(docs, stride=0)
