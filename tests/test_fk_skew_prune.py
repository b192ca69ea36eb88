"""FK audit, skew report, partition pruning."""

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.validate import fk_audit
from polars_grouper_spark.plans.skew import skew_report
from polars_grouper_spark.sources.io import write_parquet


def test_fk_audit_counts(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (2,), (9,), (None,)], ["fk"]
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    r = fk_audit(child, parent, "fk", "pk").first()
    assert r["n_child"] == 5
    assert r["n_null_keys"] == 1
    assert r["n_orphans"] == 1  # the single 9
    assert r["orphan_share"] == pytest.approx(0.2)
    assert r["sample_orphan_keys"] == ["9"]


def test_fk_audit_clean(spark):
    child = spark.createDataFrame([(1,), (2,)], ["fk"])
    parent = spark.createDataFrame([(1,), (2,)], ["pk"])
    r = fk_audit(child, parent, "fk", "pk").first()
    assert r["n_orphans"] == 0 and r["sample_orphan_keys"] == []


def test_fk_audit_sample_bounded_and_sorted(spark):
    child = spark.createDataFrame([(k,) for k in range(100, 120)], ["fk"])
    parent = spark.createDataFrame([(0,)], ["pk"])
    r = fk_audit(child, parent, "fk", "pk", sample_orphans=3).first()
    assert r["n_orphans"] == 20
    assert r["sample_orphan_keys"] == ["100", "101", "102"]
    with pytest.raises(ValueError):
        fk_audit(child, parent, "fk", "pk", sample_orphans=-1)


def test_skew_report_values(spark):
    # key 'a' x6, 'b' x3, 'c' x1
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)], ["k"]
    )
    r = skew_report(df, "k", top_k=2).first()
    assert r["n_rows"] == 10 and r["n_keys"] == 3
    assert r["top1_share"] == pytest.approx(0.6)
    assert r["topk_share"] == pytest.approx(0.9)
    assert r["max_key"] == "a"


def test_skew_report_tie_break_and_validation(spark):
    df = spark.createDataFrame([("b",), ("a",)], ["k"])
    r = skew_report(df, "k").first()
    assert r["max_key"] == "a"  # equal counts -> lexicographic min
    with pytest.raises(ValueError):
        skew_report(df, "k", top_k=0)


def test_partition_pruning_plan(spark, tmp_path):
    path = str(tmp_path / "part")
    df = spark.createDataFrame(
        [(i, ["x", "y", "z"][i % 3]) for i in range(60)], ["v", "part"]
    )
    write_parquet(df, path, partition_by=["part"])
    back = spark.read.parquet(path).where(F.col("part") == "y")
    assert back.count() == 20
    plan = back._jdf.queryExecution().executedPlan().toString()
    # Planning-time directory pruning: the partition filter appears in
    # the scan's PartitionFilters, not as a post-scan Filter.
    assert "PartitionFilters" in plan
    assert "part#" in plan.split("PartitionFilters")[1][:200]


def test_winsorize_hand_computed(spark):
    from polars_grouper_spark.functions.features import winsorize

    rows = [("g", i, float(i)) for i in range(1, 11)]  # values 1..10
    df = spark.createDataFrame(rows, ["grp", "id", "v"])
    out = {
        r["id"]: r["clipped"]
        for r in winsorize(
            df, "grp", "v", "id", lo=(2, 10), hi=(9, 10)
        ).collect()
    }
    # lo rank = ceil(10*2/10) = 2 -> 2.0; hi rank = ceil(10*9/10) = 9 -> 9.0
    assert out[1] == 2.0 and out[2] == 2.0
    assert out[9] == 9.0 and out[10] == 9.0
    assert out[5] == 5.0


def test_winsorize_groups_independent(spark):
    from polars_grouper_spark.functions.features import winsorize

    rows = [("a", 1, 1.0), ("a", 2, 100.0), ("b", 3, 7.0)]
    df = spark.createDataFrame(rows, ["grp", "id", "v"])
    out = {
        r["id"]: r["clipped"]
        for r in winsorize(df, "grp", "v", "id", lo=(1, 2), hi=(1, 1)).collect()
    }
    # group a: lo rank = ceil(2/2) = 1 -> 1.0; group b single row.
    assert out[3] == 7.0
    assert out[1] == 1.0


def test_winsorize_validation(spark):
    import pytest as _pytest

    from polars_grouper_spark.functions.features import winsorize

    df = spark.createDataFrame([("g", 1, 1.0)], ["grp", "id", "v"])
    with _pytest.raises(ValueError):
        winsorize(df, "grp", "v", "id", lo=(3, 2))
    with _pytest.raises(ValueError):
        winsorize(df, "grp", "v", "id", hi=(1, 0))
