"""TF-IDF / BM25 retrieval — known-answer tests on a tiny corpus plus
plan shape (query-term filter must reach below the aggregations)."""

import math

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions import retrieval as rt


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "cat sat on the mat"),
            (2, "cat cat dog"),
            (3, "dog runs far"),
            (4, "the mat the mat"),
        ],
        ["doc_id", "text"],
    )


def test_term_table(corpus):
    rows = {
        (r["id"], r["term"]): (r["tf"], r["doc_len"])
        for r in rt.term_table(corpus).collect()
    }
    assert rows[(2, "cat")] == (2, 3)
    assert rows[(4, "the")] == (2, 4)
    assert rows[(4, "mat")] == (2, 4)
    assert (1, "cat") in rows and rows[(1, "cat")] == (1, 5)


def test_tf_idf_values(corpus):
    got = {
        (r["id"], r["term"]): r["tfidf"] for r in rt.tf_idf(corpus).collect()
    }
    # N=4; 'cat' df=2 -> tf * (ln(5/3)+1); doc 2 tf=2
    assert got[(2, "cat")] == pytest.approx(2 * (math.log(5 / 3) + 1))
    # 'runs' df=1 -> ln(5/2)+1
    assert got[(3, "runs")] == pytest.approx(math.log(5 / 2) + 1)


def test_bm25_ranking_and_values(corpus):
    out = rt.bm25_score(corpus, ["cat", "dog"])
    got = {r["id"]: r for r in out.collect()}
    # doc 3 has no query... doc 3 has 'dog': docs 1,2,3 match; 4 doesn't.
    assert set(got) == {1, 2, 3}
    assert got[2]["n_hits"] == 2
    n, k1, b = 4, 1.2, 0.75
    avgdl = (5 + 3 + 3 + 4) / 4
    def idf(df_):
        return math.log(1 + (n - df_ + 0.5) / (df_ + 0.5))
    def contrib(tf, dl, df_):
        return idf(df_) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert got[2]["score"] == pytest.approx(
        contrib(2, 3, 2) + contrib(1, 3, 2)
    )  # cat tf=2 df=2; dog tf=1 df=2
    assert got[1]["score"] == pytest.approx(contrib(1, 5, 2))


def test_bm25_topk_deterministic_rank(corpus):
    out = rt.bm25_topk(corpus, ["cat", "dog"], k=2).collect()
    assert [r["rank"] for r in out] == [1, 2]
    # doc 2 (two hits, high tf, short doc) must rank first
    assert out[0]["id"] == 2


def test_bm25_filter_below_aggregation(corpus):
    """The isin(query terms) filter must sit under the first aggregate —
    postings outside the query are never aggregated."""
    plan = (
        rt.bm25_score(corpus, ["cat"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    agg_pos = plan.find("Aggregate")
    filt_pos = plan.find("cat")
    assert agg_pos != -1 and filt_pos != -1
    # optimizedPlan prints top-down: the term literal (filter) must appear
    # after (= below) the last Aggregate's children start; cheap proxy:
    # the filter string occurs below the FIRST Aggregate occurrence.
    assert filt_pos > agg_pos


def test_bm25_empty_query_terms(corpus):
    assert rt.bm25_score(corpus, ["zebra"]).count() == 0


def test_unigram_logprob(corpus):
    got = {r["id"]: r for r in rt.unigram_logprob(corpus).collect()}
    # corpus totals: 15 tokens; cat=3 dog=2 the=3 mat=3 sat=1 on=1 runs=1 far=1
    n = 15
    import math
    exp2 = (2 * math.log(3 / n) + math.log(2 / n)) / 3  # doc 2: cat cat dog
    assert got[2]["avg_logprob"] == pytest.approx(exp2)
    assert got[2]["ppl"] == pytest.approx(math.exp(-exp2))
    assert got[2]["n_tokens"] == 3
    # doc 3 (all rare words) must be more surprising than doc 4 (common)
    assert got[3]["avg_logprob"] < got[4]["avg_logprob"]
    assert got[3]["ppl"] > got[4]["ppl"]
