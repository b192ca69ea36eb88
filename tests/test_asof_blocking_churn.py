"""scd2_asof time travel, column churn stats, sorted-neighborhood."""

from polars_grouper_spark.operators.blocking import sorted_neighborhood_pairs
from polars_grouper_spark.operators.snapshot_diff import (
    column_change_stats,
    scd2_asof,
    scd2_history,
)


def _history(spark):
    # key 1: status a (v1-3), b (v4-7), c (v9-)
    rows = [
        (1, 1, "a"), (1, 2, "a"), (1, 3, "a"),
        (1, 4, "b"), (1, 7, "b"), (1, 9, "c"),
        (2, 5, "x"),
    ]
    df = spark.createDataFrame(rows, "k long, v long, s string")
    return scd2_history(df, ["k"], ["s"], "v")


def test_scd2_asof_picks_live_run(spark):
    hist = _history(spark)
    # as of v=8: key 1 is still in the 'b' run (c starts at 9); key 2 'x'
    got = {r["k"]: r for r in scd2_asof(hist, ["k"], 8).collect()}
    assert got[1]["s"] == "b" and got[1]["valid_from"] == 4
    assert got[2]["s"] == "x"
    # as of v=3: key 1 'a'; key 2 doesn't exist yet
    got3 = {r["k"]: r for r in scd2_asof(hist, ["k"], 3).collect()}
    assert got3[1]["s"] == "a" and 2 not in got3


def test_column_change_stats_counts_per_column(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30)], "k long, x string, y long"
    )
    new = spark.createDataFrame(
        [(1, "a", 11), (2, "B", 20), (3, None, 30), (4, "new", 0)],
        "k long, x string, y long",
    )
    got = {
        r["column"]: r
        for r in column_change_stats(old, new, ["k"], ["x", "y"]).collect()
    }
    # key 4 is not compared (inner join); NULL==NULL is no change
    assert got["x"]["n_compared"] == 3 and got["x"]["n_changed"] == 1
    assert got["y"]["n_changed"] == 1
    assert got["y"]["change_rate"] == 1 / 3


def test_sorted_neighborhood_window_pairs(spark):
    rows = [(i, f"name{i:02d}") for i in range(6)]
    df = spark.createDataFrame(rows, "id long, name string")
    pairs = sorted(
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(df, "id", "name", window=3).collect()
    )
    want = sorted(
        [(i, i + 1) for i in range(5)] + [(i, i + 2) for i in range(4)]
    )
    assert pairs == want  # exactly w-1 pairs per record (edge-truncated)


def test_sorted_neighborhood_catches_prefix_typo(spark):
    # key blocking on first char would separate 'zmith'/'smith'; the
    # sort on the key still puts smith/smyth adjacent
    rows = [(1, "smith"), (2, "smyth"), (3, "jones"), (4, "janes")]
    df = spark.createDataFrame(rows, "id long, name string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(df, "id", "name", window=2).collect()
    }
    assert (1, 2) in pairs and (4, 3) in pairs


def test_reciprocity_known(spark):
    from polars_grouper_spark.operators.degree_stats import reciprocity

    # a<->b mutual, a->c one-way, self-loop d->d ignored, dup edges collapse
    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("d", "d"), ("a", "b")]
    df = spark.createDataFrame(edges, "s string, d string")
    got = reciprocity(df, "s", "d").first()
    assert got["n_edges"] == 3 and got["n_reciprocal"] == 2
    assert got["reciprocity"] == 2 / 3


def test_item_cosine_known(spark):
    from polars_grouper_spark.operators.link_prediction import (
        item_cosine_pairs,
    )
    import math

    # i appears in anchors {1,2,3}; j in {2,3}; co = 2
    rows = [(1, "i"), (2, "i"), (3, "i"), (2, "j"), (3, "j")]
    df = spark.createDataFrame(rows, "anchor long, item string")
    got = item_cosine_pairs(df, "anchor", "item").first()
    assert (got["item_a"], got["item_b"]) == ("i", "j")
    assert got["n_co"] == 2 and got["n_a"] == 3 and got["n_b"] == 2
    assert got["cosine"] == 2 / math.sqrt(6)


def test_burst_runs_finds_spike_spans(spark):
    import datetime as dt

    from polars_grouper_spark.operators.changepoint import burst_runs

    rows = []
    base = dt.datetime(2024, 1, 1)
    # baseline: 2 events/hour for hours 0..9; spike: 10/hour in hours 3-4,
    # and an isolated spike at hour 8
    for h in range(10):
        n = 2
        if h in (3, 4):
            n = 10
        if h == 8:
            n = 9
        for i in range(n):
            rows.append(("k", base + dt.timedelta(hours=h, minutes=i)))
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    runs = sorted(
        (r["start_bucket"], r["end_bucket"], r["n_buckets"], r["peak"])
        for r in burst_runs(df, "k", "ts", step_s=3600, factor=2.0).collect()
    )
    b0 = runs[0][0] - 3  # hour-3 bucket minus 3 = base bucket
    assert runs == [(b0 + 3, b0 + 4, 2, 10), (b0 + 8, b0 + 8, 1, 9)]
