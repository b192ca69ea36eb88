"""Theil-Sen robust slope and exact weighted median."""

import pytest

from polars_grouper_spark.functions.outliers import weighted_median
from polars_grouper_spark.functions.regression import theil_sen


def _brute_theil_sen(pts):
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1 :]
        if x2 != x1
    )
    n = len(slopes)
    if n % 2:
        return slopes[n // 2]
    return (slopes[n // 2 - 1] + slopes[n // 2]) / 2


def test_theil_sen_resists_outlier(spark):
    # perfect slope 2 with one wild point; OLS would bend, TS must not
    pts = [(float(x), 2.0 * x) for x in range(10)] + [(10.0, 1000.0)]
    df = spark.createDataFrame([("g", x, y) for x, y in pts], "g string, x double, y double")
    got = theil_sen(df, "g", "x", "y").first()
    assert got["slope"] == 2.0
    assert got["n_points"] == 11 and got["n_pairs"] == 55


def test_theil_sen_matches_brute_force_even_and_odd(spark):
    pts_a = [(float(x), float((x * 7) % 5) + 0.3 * x) for x in range(8)]
    pts_b = [(float(x), float((x * 3) % 4) - 0.1 * x) for x in range(7)]
    rows = [("a", x, y) for x, y in pts_a] + [("b", x, y) for x, y in pts_b]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["grp"]: r["slope"] for r in theil_sen(df, "g", "x", "y").collect()}
    assert got["a"] == _brute_theil_sen(pts_a)
    assert got["b"] == _brute_theil_sen(pts_b)


def test_theil_sen_degenerate_group_is_null(spark):
    # all x equal -> no valid pairs -> NULL slope, still one output row
    df = spark.createDataFrame(
        [("g", 1.0, 5.0), ("g", 1.0, 9.0)], "g string, x double, y double"
    )
    got = theil_sen(df, "g", "x", "y").first()
    assert got["slope"] is None and got["n_points"] == 2


def test_theil_sen_group_cap_raises(spark):
    rows = [("g", float(i), float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    with pytest.raises(Exception, match="max_group_rows"):
        theil_sen(df, "g", "x", "y", max_group_rows=10).collect()


def test_weighted_median_known(spark):
    # values 1..4 with weights 1,1,1,5 -> half of 8 is 4, reached at v=4
    rows = [("g", 1, 1), ("g", 2, 1), ("g", 3, 1), ("g", 4, 5)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = weighted_median(df, "g", "v", "w").first()
    assert got["wmedian"] == 4 and got["total_w"] == 8


def test_weighted_median_equals_plain_median_with_unit_weights(spark):
    vals = [9, 1, 7, 3, 5]
    df = spark.createDataFrame([("g", v, 1) for v in vals], "g string, v long, w long")
    assert weighted_median(df, "g", "v", "w").first()["wmedian"] == 5
    # even count: lower median
    df2 = spark.createDataFrame(
        [("g", v, 1) for v in [1, 3, 5, 7]], "g string, v long, w long"
    )
    assert weighted_median(df2, "g", "v", "w").first()["wmedian"] == 3


def test_weighted_median_duplicate_values_merge(spark):
    rows = [("g", 2, 3), ("g", 2, 3), ("g", 10, 1)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = weighted_median(df, "g", "v", "w").first()
    assert got["wmedian"] == 2 and got["total_w"] == 7
