"""Plan-shape assertions for the batch-4 operators: the prune/broadcast
/single-shuffle claims in the docstrings, pinned against regressions."""

from pyspark.sql import functions as F

from polars_grouper_spark.functions.evaluation import roc_auc
from polars_grouper_spark.functions.selection import budget_select
from polars_grouper_spark.operators.golden_record import golden_record
from polars_grouper_spark.plans.layout import clustering_report


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_budget_select_prune_is_a_semi_join(spark):
    df = spark.createDataFrame(
        [(i, ((i * 37) % 100) / 100.0, 10) for i in range(1000)],
        "id long, score double, cost long",
    )
    pruned = budget_select(df, "id", "score", "cost", 500, coarse_buckets=16)
    plain = budget_select(df, "id", "score", "cost", 500, coarse_buckets=None)
    assert "LeftSemi" in _plan(pruned)
    assert "LeftSemi" not in _plan(plain)


def test_golden_record_is_one_shuffle(spark):
    df = spark.createDataFrame(
        [(1, 1, 10, "a")], "k long, ts long, id long, v string"
    )
    plan = _plan(golden_record(df, "k", "ts", "id", ["v"]))
    # exactly one Exchange, with the partial (map-side) max below it —
    # struct-max plans as SortAggregate, which still partial-aggregates
    assert plan.count("Exchange") == 1
    assert "partial_max" in plan
    assert plan.index("partial_max") > plan.index("Exchange")  # below it


def test_clustering_report_broadcasts_the_overlap_join(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    plan = _plan(clustering_report(df, ["k"], "k", 25))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_roc_auc_no_pair_join(spark):
    df = spark.createDataFrame(
        [(float(i % 7), i % 2) for i in range(100)], "score double, label int"
    )
    plan = _plan(roc_auc(df, "score", "label"))
    # Mann-Whitney form: aggregations + one window, never a join
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_theil_sen_guard_stays_in_plan(spark):
    from polars_grouper_spark.functions.regression import theil_sen

    df = spark.createDataFrame(
        [("g", float(i), float(i)) for i in range(5)],
        "g string, x double, y double",
    )
    plan = _plan(theil_sen(df, "g", "x", "y", max_group_rows=100))
    # the lazy size guard must not be optimized away
    assert "raise_error" in plan
