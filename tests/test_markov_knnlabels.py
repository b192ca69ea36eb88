"""Markov transitions and kNN label consistency."""

import pytest

from polars_grouper_spark.functions.similarity import knn_label_check
from polars_grouper_spark.operators.sequences import markov_transitions


def test_markov_hand_computed(spark):
    rows = [
        ("u", 1, "a"), ("u", 2, "b"), ("u", 3, "a"), ("u", 4, "b"),
        ("v", 1, "a"), ("v", 2, "c"),
    ]
    df = spark.createDataFrame(rows, ["key", "t", "state"])
    out = {
        (r["src_state"], r["dst_state"]): (r["n"], r["p"])
        for r in markov_transitions(df, "key", ["t"], "state").collect()
    }
    # from 'a': a->b x2, a->c x1; from 'b': b->a x1.
    assert out[("a", "b")] == (2, pytest.approx(2 / 3, abs=1e-6))
    assert out[("a", "c")] == (1, pytest.approx(1 / 3, abs=1e-6))
    assert out[("b", "a")] == (1, 1.0)
    assert ("c", "a") not in out  # sequences don't cross keys


def test_markov_probabilities_sum_to_one(spark):
    rows = [("u", i, "s" + str(i * 7 % 4)) for i in range(40)]
    df = spark.createDataFrame(rows, ["key", "t", "state"])
    out = markov_transitions(df, "key", ["t"], "state").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src_state"], 0.0)
        by_src[r["src_state"]] += r["p"]
    for s, total in by_src.items():
        assert total == pytest.approx(1.0, abs=1e-5), s


def test_knn_label_flags_planted_mislabel(spark):
    # Two tight clusters; one point of cluster A carries label B.
    rows = []
    for i in range(6):
        rows.append((i, [1.0 + i * 0.01, 0.0], "A" if i != 0 else "B"))
    for i in range(6, 12):
        rows.append((i, [0.0, 1.0 + i * 0.01], "B"))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r["id"]: r for r in knn_label_check(df, k=3).collect()}
    assert out[0]["flagged"] is True and out[0]["knn_label"] == "A"
    assert out[1]["flagged"] is False
    assert out[7]["flagged"] is False
    assert out[1]["n_votes"] == 3


def test_knn_label_validation(spark):
    df = spark.createDataFrame([(1, [1.0], "A")], ["vec_id", "embedding", "label"])
    with pytest.raises(ValueError):
        knn_label_check(df, k=0)
