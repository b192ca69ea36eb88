"""golden_record survivorship and exact KS statistic."""

import datetime as dt

from polars_grouper_spark.functions.drift import ks_drift
from polars_grouper_spark.operators.golden_record import golden_record


def _ts(day):
    return dt.datetime(2024, 1, day)


def test_golden_record_latest_non_null_wins(spark):
    rows = [
        # key, ts, id, name, city
        (1, _ts(1), 10, "ann", "nyc"),
        (1, _ts(3), 11, None, "sf"),     # newest but name is null
        (1, _ts(2), 12, "anne", None),
        (2, _ts(5), 20, None, None),
        (2, _ts(4), 21, "bob", "la"),
    ]
    df = spark.createDataFrame(
        rows, "k long, ts timestamp, id long, name string, city string"
    )
    got = {
        r["key"]: r
        for r in golden_record(df, "k", "ts", "id", ["name", "city"]).collect()
    }
    assert got[1]["name"] == "anne"  # latest NON-NULL, not latest
    assert got[1]["city"] == "sf"
    assert got[1]["n_records"] == 3 and got[1]["last_ts"] == _ts(3)
    assert got[2]["name"] == "bob" and got[2]["city"] == "la"


def test_golden_record_tie_breaks_on_id(spark):
    rows = [(1, _ts(1), 5, "low"), (1, _ts(1), 9, "high")]
    df = spark.createDataFrame(rows, "k long, ts timestamp, id long, v string")
    got = golden_record(df, "k", "ts", "id", ["v"]).first()
    assert got["v"] == "high"


def _brute_ks(a, b):
    vals = sorted(set(a) | set(b))
    best = 0.0
    for v in vals:
        fa = sum(1 for x in a if x <= v) / len(a)
        fb = sum(1 for x in b if x <= v) / len(b)
        best = max(best, abs(fa - fb))
    return best


def test_ks_identical_is_zero(spark):
    a = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    got = ks_drift(a, a, "v").first()
    assert got["ks"] == 0.0 and got["n_a"] == got["n_b"] == 50


def test_ks_disjoint_is_one(spark):
    a = spark.createDataFrame([(float(i),) for i in range(20)], "v double")
    b = spark.createDataFrame([(float(i + 100),) for i in range(30)], "v double")
    assert ks_drift(a, b, "v").first()["ks"] == 1.0


def test_ks_matches_brute_force(spark):
    xs = [float((i * 17) % 23) for i in range(40)]
    ys = [float((i * 11) % 29) + 2.0 for i in range(55)]
    a = spark.createDataFrame([(v,) for v in xs], "v double")
    b = spark.createDataFrame([(v,) for v in ys], "v double")
    got = ks_drift(a, b, "v").first()
    # exact integer cross-multiplication -> exact rational; brute uses
    # floats, so compare within an ulp margin
    assert abs(got["ks"] - _brute_ks(xs, ys)) < 1e-12


def test_phrase_match_counts_consecutive_occurrences(spark):
    from polars_grouper_spark.functions.retrieval import phrase_match

    docs = [
        (1, "the cat sat on the cat mat"),
        (2, "cat the cat the cat"),       # "the cat" twice
        (3, "concatenate the category"),   # substring traps, no token match
        (4, "THE CAT sleeps"),             # case-insensitive
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["id"]: r["n_matches"] for r in phrase_match(df, "the cat").collect()}
    assert got == {1: 2, 2: 2, 4: 1}


def test_phrase_match_overlapping(spark):
    from polars_grouper_spark.functions.retrieval import phrase_match

    df = spark.createDataFrame(
        [(1, "a a a a")], "doc_id long, text string"
    )
    got = phrase_match(df, "a a").collect()
    assert got[0]["n_matches"] == 3


def test_gaps_report_counts_missing_buckets(spark):
    from polars_grouper_spark.functions.timeseries import gaps_report

    rows = [
        ("k", dt.datetime(2024, 1, 1, 0, 10)),
        ("k", dt.datetime(2024, 1, 1, 0, 50)),  # same hour bucket
        ("k", dt.datetime(2024, 1, 1, 3, 5)),   # hours 1, 2 missing
        ("full", dt.datetime(2024, 1, 1, 7)),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {r["key"]: r for r in gaps_report(df, "k", "ts", 3600).collect()}
    assert got["k"]["expected"] == 4 and got["k"]["observed"] == 2
    assert got["k"]["missing"] == 2
    assert got["full"]["missing"] == 0 and got["full"]["expected"] == 1
