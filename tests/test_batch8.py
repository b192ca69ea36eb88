"""Round-5 batch 8: bipartiteness, Naive Bayes, WoE binning."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.features import woe_bins
from polars_grouper_spark.functions.naive_bayes import nb_token_probs
from polars_grouper_spark.operators.bipartite import bipartite_check


def test_bipartite_even_cycle_true(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], ["from", "to"]
    )
    rows = {r.node: r for r in bipartite_check(df).collect()}
    assert all(r.is_bipartite for r in rows.values())
    # proper 2-coloring: adjacent nodes differ
    for u, v in [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]:
        assert rows[u].side != rows[v].side
    assert {r.comp for r in rows.values()} == {"a"}


def test_bipartite_odd_cycle_false(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["from", "to"]
    )
    rows = bipartite_check(df).collect()
    assert all(not r.is_bipartite for r in rows)
    assert all(r.side is None for r in rows)


def test_bipartite_self_loop_poisons_component(spark):
    df = spark.createDataFrame([("a", "a"), ("b", "c")], ["from", "to"])
    rows = {r.node: r for r in bipartite_check(df).collect()}
    assert not rows["a"].is_bipartite
    assert rows["b"].is_bipartite and rows["c"].is_bipartite


def test_bipartite_mixed_components(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y")], ["from", "to"]
    )
    rows = {r.node: r for r in bipartite_check(df).collect()}
    assert not rows["a"].is_bipartite and rows["x"].is_bipartite
    assert rows["x"].comp == "x" and rows["a"].comp == "a"


def test_nb_probs_sum_and_smoothing(spark):
    df = spark.createDataFrame(
        [("pos", "good good great"), ("neg", "bad bad good")],
        ["lbl", "text"],
    )
    out = nb_token_probs(df, "lbl", "text", alpha=1, min_count=1).collect()
    rows = {(r.label, r.token): r for r in out}
    # vocab = {good, great, bad}, V=3; pos total=3, neg total=3
    assert rows[("pos", "good")].cond_p == pytest.approx((2 + 1) / (3 + 3))
    assert rows[("pos", "great")].cond_p == pytest.approx((1 + 1) / (3 + 3))
    assert rows[("neg", "bad")].cond_p == pytest.approx((2 + 1) / (3 + 3))
    # observed-pair probs + unseen mass normalize per label:
    # sum over vocab of (n+1)/(total+V) == 1 when every token counted
    for lbl, total in [("pos", 3), ("neg", 3)]:
        s = sum(r.cond_p for (l, _), r in rows.items() if l == lbl)
        unseen = sum(
            1 / (total + 3)
            for tok in ["good", "great", "bad"]
            if (lbl, tok) not in rows
        )
        assert s + unseen == pytest.approx(1.0)


def test_nb_min_count_prunes_vocab(spark):
    df = spark.createDataFrame(
        [("a", "common common rare"), ("b", "common")], ["lbl", "text"]
    )
    toks = {r.token for r in nb_token_probs(df, "lbl", min_count=2).collect()}
    assert toks == {"common"}


def test_woe_bins_bruteforce(spark):
    rows = [(float(i), 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, ["v", "y"])
    out = {r.bin: r for r in woe_bins(df, "v", "y", n_bins=4).collect()}
    # bins 0-1: all neg; bins 2-3: all pos; width = 99/4
    tp, tn = 50, 50
    for b, (np_, nn) in {0: (0, 25), 1: (0, 25), 2: (25, 0), 3: (25, 0)}.items():
        r = out[b]
        assert (r.n_pos, r.n_neg) == (np_, nn), b
        woe = math.log(((np_ + 0.5) * tn) / ((nn + 0.5) * tp))
        assert r.woe == pytest.approx(round(woe, 6), abs=2e-6)
        iv = (np_ / tp - nn / tn) * woe
        assert r.iv_term == pytest.approx(round(iv, 6), abs=2e-6)


def test_woe_single_value_column(spark):
    df = spark.createDataFrame([(5.0, 1), (5.0, 0)], ["v", "y"])
    out = woe_bins(df, "v", "y", n_bins=3).collect()
    assert len(out) == 1 and out[0].bin == 0
    assert out[0].n_pos == 1 and out[0].n_neg == 1
