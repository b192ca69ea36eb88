"""PII scrub, deterministic splits/sampling, and repetition stats —
known-answer unit tests (the DuckDB cross-engine checks live in the
oracle gate; these pin the semantics directly)."""

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions import sampling as smp
from polars_grouper_spark.functions import scrub
from polars_grouper_spark.functions.text import repetition_stats


# ---------------------------------------------------------------------------
# pii_scrub
# ---------------------------------------------------------------------------


def test_pii_scrub_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@ex-ample.org or c@d.io thanks"),
            (2, "visit https://x.io/p?e=a@b.co and http://y.z/"),
            (3, "server at 10.0.0.1 and 192.168.1.255"),
            (4, "clean text with no pii at all"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r.asDict() for r in scrub.pii_scrub(df).collect()
    }
    assert (got[1]["n_url"], got[1]["n_email"], got[1]["n_ipv4"]) == (0, 2, 0)
    assert got[1]["redacted"] == "mail me at <EMAIL> or <EMAIL> thanks"
    # the email inside the URL is swallowed by the URL pass (order matters)
    assert (got[2]["n_url"], got[2]["n_email"], got[2]["n_ipv4"]) == (2, 0, 0)
    assert got[2]["redacted"] == "visit <URL> and <URL>"
    assert (got[3]["n_url"], got[3]["n_email"], got[3]["n_ipv4"]) == (0, 0, 2)
    assert got[3]["redacted"] == "server at <IPV4> and <IPV4>"
    assert got[4]["redacted"] == "clean text with no pii at all"


def plan_str(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_pii_scrub_is_projection_only(spark):
    """The scrub plan must contain no Exchange — pure row-local work."""
    df = spark.createDataFrame([(1, "x a@b.co")], ["doc_id", "text"])
    assert "Exchange" not in plan_str(scrub.pii_scrub(df))


# ---------------------------------------------------------------------------
# deterministic_split / stratified_sample
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).select(F.col("id").alias("doc_id"))


def test_split_is_deterministic_and_partitions(ids):
    a = {r["doc_id"]: r["split"] for r in smp.deterministic_split(ids, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in smp.deterministic_split(ids.repartition(7), "doc_id").collect()
    }
    assert a == b  # stable under partitioning
    assert set(a.values()) == {"train", "val", "test"}


def test_split_fractions_approximate(ids):
    counts = {
        r["split"]: r["count"]
        for r in smp.deterministic_split(ids, "doc_id").groupBy("split").count().collect()
    }
    n = sum(counts.values())
    assert n == 2000
    assert abs(counts["train"] / n - 0.90) < 0.03
    assert abs(counts["val"] / n - 0.05) < 0.02
    assert abs(counts["test"] / n - 0.05) < 0.02


def test_split_salt_rerolls(ids):
    a = {r["doc_id"]: r["split"] for r in smp.deterministic_split(ids, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in smp.deterministic_split(ids, "doc_id", salt="other").collect()
    }
    assert a != b


def test_split_custom_weights_order_applied(ids):
    out = smp.deterministic_split(
        ids, "doc_id", weights={"big": 1.0}
    )
    assert out.where(F.col("split") != "big").count() == 0


def test_stratified_sample_fractions(spark):
    df = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    out = smp.stratified_sample(df, {"en": 0.4, "de": 0.1}, "lang")
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert abs(counts["en"] / 1500 - 0.4) < 0.05
    assert abs(counts["de"] / 1500 - 0.1) < 0.04


def test_stratified_sample_default_fraction_drops_unlisted(spark):
    df = spark.createDataFrame([(1, "xx"), (2, "xx")], ["doc_id", "lang"])
    assert smp.stratified_sample(df, {"en": 1.0}, "lang").count() == 0
    assert (
        smp.stratified_sample(df, {"en": 1.0}, "lang", default_fraction=1.0).count()
        == 2
    )


def test_sample_independent_of_split(ids):
    """Same id must not correlate across the two decisions: the val-set
    sampling rate should match the global sampling rate."""
    split = smp.deterministic_split(ids, "doc_id")
    sampled = smp.stratified_sample(
        split.withColumn("lang", F.lit("en")), {"en": 0.5}, "lang"
    )
    val_total = split.where(F.col("split") == "val").count()
    val_sampled = sampled.where(F.col("split") == "val").count()
    assert abs(val_sampled / val_total - 0.5) < 0.15


# ---------------------------------------------------------------------------
# repetition_stats
# ---------------------------------------------------------------------------


def test_repetition_known_answers(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # 1 distinct token; bigram 'a a' x3
            (2, "a b c d"),          # all unique
            (3, "a b a b a"),        # bigrams: 'a b' x2, 'b a' x2
            (4, "solo"),             # no bigrams
            (5, ""),                 # no tokens
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    assert got[1]["n_tokens"] == 4
    assert got[1]["dup_token_frac"] == pytest.approx(0.75)
    assert got[1]["dup_bigram_frac"] == pytest.approx(2 / 3)
    assert got[1]["top_bigram_frac"] == pytest.approx(1.0)
    assert got[2]["dup_token_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == pytest.approx(1 / 3)
    assert got[3]["dup_token_frac"] == pytest.approx(0.6)
    assert got[3]["top_bigram_frac"] == pytest.approx(0.5)
    assert got[4]["n_tokens"] == 1
    assert got[4]["dup_bigram_frac"] == 0.0
    assert got[4]["top_bigram_frac"] == 0.0
    assert got[5]["n_tokens"] == 0
    assert got[5]["dup_token_frac"] == 0.0


def test_repetition_single_scan(spark):
    """One corpus scan: the row-local metrics ride through the explode as
    grouping keys instead of re-scanning + joining."""
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = plan_str(repetition_stats(df))
    # one "(n) Scan ..." detail header per physical scan node
    assert plan.count(") Scan ") == 1
    assert "Join" not in plan


def test_token_budget_mix_under_budget_group_passes_whole(spark):
    from polars_grouper_spark.functions.sampling import token_budget_mix

    rows = [(i, "small", 10) for i in range(20)] + [
        (100 + i, "big", 100) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_tok"])
    kept = token_budget_mix(
        df, {"small": 1000.0, "big": 2000.0}, "lang", "n_tok"
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_lang["small"] == 20  # budget 1000 >= total 200 -> keep all
    # big: total 10000, budget 2000 -> ~20% kept (hash Bernoulli, wide slack)
    assert 5 <= by_lang.get("big", 0) <= 40


def test_token_budget_mix_unlisted_group_dropped_and_deterministic(spark):
    from polars_grouper_spark.functions.sampling import token_budget_mix

    rows = [(i, ["en", "fr"][i % 2], 50) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_tok"])
    a = sorted(r["doc_id"] for r in token_budget_mix(df, {"en": 500.0}, "lang", "n_tok").collect())
    b = sorted(r["doc_id"] for r in token_budget_mix(df, {"en": 500.0}, "lang", "n_tok").collect())
    assert a == b  # pure hash decision, stable across runs
    langs = {r["lang"] for r in token_budget_mix(df, {"en": 500.0}, "lang", "n_tok").collect()}
    assert langs <= {"en"}  # fr has default budget 0 -> dropped


def test_weighted_sample_topk_monotone_and_deterministic(spark):
    from polars_grouper_spark.functions.sampling import weighted_sample_topk

    # two strata of weights: heavy rows 100x the weight of light rows
    rows = [(i, "g", 100.0 if i % 2 == 0 else 1.0) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "w"])
    kept = weighted_sample_topk(df, 50, "w", "doc_id", "grp").collect()
    assert len(kept) == 50
    heavy = sum(1 for r in kept if r["doc_id"] % 2 == 0)
    assert heavy >= 40  # 100x weight dominates the sample
    again = weighted_sample_topk(df, 50, "w", "doc_id", "grp").collect()
    assert sorted(r["doc_id"] for r in kept) == sorted(r["doc_id"] for r in again)


def test_weighted_sample_topk_skips_nonpositive(spark):
    from polars_grouper_spark.functions.sampling import weighted_sample_topk

    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 5.0)], ["doc_id", "w"]
    )
    got = [r["doc_id"] for r in weighted_sample_topk(df, 10, "w").collect()]
    assert got == [4]


def test_mixture_waterfill_plan_and_realization(spark):
    """Water-filling semantics: the binding group keeps rate 1.0, the
    others downsample so planned weights realize the target shares
    exactly; untargeted groups drop; plan arithmetic is integer-sum +
    literal-share IEEE ops (oracle-replayable)."""
    from polars_grouper_spark.functions.sampling import mixture_waterfill

    rows = (
        [(f"a{i}", "A", 10) for i in range(100)]   # avail 1000
        + [(f"b{i}", "B", 10) for i in range(20)]  # avail 200  <- binding for share .5
        + [(f"c{i}", "C", 10) for i in range(50)]  # untargeted
    )
    df = spark.createDataFrame(rows, "doc_id string, grp string, w long")
    plan = {
        r["grp"]: r
        for r in mixture_waterfill(
            df, {"A": 0.5, "B": 0.5}, "grp", "w", "doc_id"
        ).collect()
    }
    assert set(plan) == {"A", "B"}  # C dropped
    # S = min(1000/.5, 200/.5) = 400 -> planned 200 each
    assert plan["B"]["rate"] == 1.0 and plan["B"]["planned_w"] == 200.0
    assert plan["A"]["rate"] == 0.2 and plan["A"]["planned_w"] == 200.0
    assert plan["B"]["kept_rows"] == 20 and plan["B"]["kept_w"] == 200
    # realized A is the hash-Bernoulli draw around the plan, never above
    # availability and reproducibly identical run to run
    again = {
        r["grp"]: r
        for r in mixture_waterfill(
            df, {"A": 0.5, "B": 0.5}, "grp", "w", "doc_id"
        ).collect()
    }
    assert {g: (r["kept_rows"], r["kept_w"]) for g, r in plan.items()} == {
        g: (r["kept_rows"], r["kept_w"]) for g, r in again.items()
    }

    import pytest as _pytest

    with _pytest.raises(ValueError):
        mixture_waterfill(df, {}, "grp", "w", "doc_id")
    with _pytest.raises(ValueError):
        mixture_waterfill(df, {"A": -1.0, "B": 1.0}, "grp", "w", "doc_id")


def test_dsir_weights_favor_target_like_docs(spark):
    from pyspark.sql import functions as F

    from polars_grouper_spark.functions.sampling import dsir_weights

    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the dog sat on the rug", "en"),
        (3, "le chat est sur le tapis", "fr"),
        (4, "le chien est sur le lit", "fr"),
        (5, "the cat sat on the rug", "fr"),  # en-like text, raw-only slice
        (6, "", "en"),                        # zero tokens
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {
        r["doc_id"]: r
        for r in dsir_weights(df, F.col("lang") == "en", n_buckets=256).collect()
    }
    assert len(out) == 6
    # en-like docs outscore fr-like docs against the en target
    assert out[5]["dsir_logw"] > out[3]["dsir_logw"]
    assert out[1]["dsir_logw"] > out[4]["dsir_logw"]
    # zero-token doc: no features, weight exactly 0
    assert out[6]["n_feats"] == 0 and out[6]["dsir_logw"] == 0.0
    # unigrams + bigrams: 6 tokens -> 11 feature instances
    assert out[1]["n_feats"] == 11


def test_dsir_weights_duckdb_parity(spark):
    import duckdb
    from pyspark.sql import functions as F

    from polars_grouper_spark.functions.sampling import (
        dsir_weights,
        dsir_weights_sql,
    )

    rows = [
        (1, "alpha beta gamma", "en"),
        (2, "beta gamma delta alpha", "en"),
        (3, "uno dos tres cuatro", "es"),
        (4, "alpha dos beta tres", "es"),
        (5, None, "en"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = sorted(
        (r["doc_id"], r["n_feats"], round(r["dsir_logw"], 9))
        for r in dsir_weights(df, F.col("lang") == "en", n_buckets=64).collect()
    )
    vals = ",".join(
        f"({i}, {('NULL' if t is None else repr(t))}, '{lg}')" for i, t, lg in rows
    )
    sql = dsir_weights_sql(
        f"(SELECT * FROM (VALUES {vals}) t(doc_id, text, lang))",
        "lang = 'en'",
        n_buckets=64,
    )
    want = sorted(
        (r[0], r[1], round(r[2], 9)) for r in duckdb.sql(sql).fetchall()
    )
    assert got == want
