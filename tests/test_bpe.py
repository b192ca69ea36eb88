"""Distributed BPE training vs the classic sequential algorithm."""

import collections

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.bpe import SENTINEL, bpe_apply, bpe_train


def _classic_bpe(texts, n):
    """Reference implementation: the textbook dict loop (Sennrich 2016),
    ties broken by (count desc, pair asc)."""
    vocab = collections.Counter()
    for text in texts:
        for w in text.split():
            vocab[tuple(SENTINEL + c for c in w)] += 1
    merges = []
    for k in range(n):
        pairs = collections.Counter()
        for sym, nn in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += nn
        if not pairs:
            break
        (a, b), c = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((k + 1, a, b, a + b[1:], c))
        newv = collections.Counter()
        for sym, nn in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b[1:])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            newv[tuple(out)] += nn
        vocab = newv
    return merges


TEXTS = [
    "the cat sat on the mat the cat",
    "a cat and the hat sat flat",
    "the theme of the thesis is the best",
]


def test_bpe_train_matches_classic(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = [tuple(r) for r in bpe_train(df, "text", n_merges=10).collect()]
    assert got == _classic_bpe(TEXTS, 10)


def test_bpe_train_greedy_overlap_semantics(spark):
    # "aaaa" -> pair (·a,·a) count 3 per word occurrence; after merge the
    # word is ·aa ·aa (greedy left-to-right), NOT ·aa ·a ·a.
    df = spark.createDataFrame([("aaaa aaaa",)], "text string")
    m = bpe_train(df, "text", n_merges=2).collect()
    assert (m[0]["lhs"], m[0]["rhs"], m[0]["merged"]) == ("·a", "·a", "·aa")
    assert m[0]["pair_count"] == 6  # 3 adjacent pairs x 2 words
    assert (m[1]["lhs"], m[1]["rhs"]) == ("·aa", "·aa")


def test_bpe_apply_roundtrip(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = [tuple(r) for r in bpe_train(df, "text", n_merges=8).collect()]
    enc = bpe_apply(df, merges).collect()
    for row in enc:
        # lossless: stripping sentinels and concatenating reproduces the
        # original characters in order
        joined = "".join(t.replace(SENTINEL, "") for t in row["bpe_tokens"])
        assert joined == "".join(row["text"].split())
        # learned merges actually compress: fewer tokens than chars
        assert len(row["bpe_tokens"]) < len(joined)
        # every token is a learned symbol or a single sentineled char
        learned = {m[3] for m in merges}
        for t in row["bpe_tokens"]:
            assert t in learned or len(t.replace(SENTINEL, "")) == 1


def test_bpe_train_early_stop_and_validation(spark):
    df = spark.createDataFrame([("a b c",)], "text string")  # no pairs ever
    m = bpe_train(df, "text", n_merges=5).collect()
    assert m == []  # single-char words have no adjacent pairs
    with pytest.raises(ValueError):
        bpe_train(df, "text", n_merges=0)


def test_bpe_train_deterministic_under_repartition(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    a = [tuple(r) for r in bpe_train(df, "text", n_merges=6).collect()]
    b = [
        tuple(r)
        for r in bpe_train(df.repartition(7), "text", n_merges=6).collect()
    ]
    assert a == b


def test_bpe_train_local_tier_matches_distributed(spark):
    """r9-opt: the guarded driver-local merge-round tier (default) must be
    bit-identical to the distributed loop (max_local_vocab=0 forces it),
    including early stop and tie-breaks."""
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    local = [tuple(r) for r in bpe_train(df, "text", n_merges=10).collect()]
    dist = [
        tuple(r)
        for r in bpe_train(df, "text", n_merges=10, max_local_vocab=0).collect()
    ]
    assert local == dist == _classic_bpe(TEXTS, 10)


def test_bpe_token_counts_matches_apply_both_tiers(spark):
    """bpe_token_counts (vocab-weighted counting, no corpus re-encode)
    equals explode+count over a real bpe_apply pass, on both tiers."""
    from polars_grouper_spark.functions.bpe import bpe_token_counts

    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = sorted(
        bpe_train(df, "text", n_merges=6).collect(), key=lambda r: r["merge_idx"]
    )
    want = sorted(
        (r["token"], r["n_occ"])
        for r in bpe_apply(df, [tuple(r) for r in merges])
        .select(F.explode("bpe_tokens").alias("tok"))
        .groupBy(F.regexp_replace("tok", SENTINEL, "").alias("token"))
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .collect()
    )
    for guard in (None, 0):  # local tier, then forced-distributed
        got = sorted(
            (r["token"], r["n_occ"])
            for r in bpe_token_counts(
                df, "text", n_merges=6, max_local_vocab=guard
            ).collect()
        )
        assert got == want and len(got) > 3


def test_bpe_encode_sql_matches_corpus_apply(spark):
    """The oracle's vocab-state shortcut equals a real bpe_apply pass
    over the corpus (words encode independently)."""
    import duckdb

    from polars_grouper_spark.functions.bpe import (
        SENTINEL,
        bpe_apply,
        bpe_encode_sql,
        bpe_train,
    )
    from pyspark.sql import functions as F

    rows = [(1, "low low lower lowest"), (2, "new newer newest low")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = sorted(
        bpe_train(df, "text", n_merges=4).collect(), key=lambda r: r["merge_idx"]
    )
    got = sorted(
        (r["token"], r["n_occ"])
        for r in bpe_apply(df, merges)
        .select(F.explode("bpe_tokens").alias("tok"))
        .groupBy(F.regexp_replace("tok", SENTINEL, "").alias("token"))
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .collect()
    )
    vals = ",".join(f"({i}, '{t}')" for i, t in rows)
    sql = bpe_encode_sql(
        f"SELECT * FROM (VALUES {vals}) t(doc_id, text)", n_merges=4, k=1000
    )
    want = sorted((r[0], r[1]) for r in duckdb.sql(sql).fetchall())
    assert got == want and len(got) > 3
