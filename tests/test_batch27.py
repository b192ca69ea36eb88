"""Round-5 batch 27: difference-in-differences, trimmed mean."""

from __future__ import annotations

import pytest

from polars_grouper_spark.functions.experiment import diff_in_diff
from polars_grouper_spark.functions.outliers import trimmed_mean


def test_did_recovers_planted_effect(spark):
    rows = []
    # control: 10 pre, 12 post (trend +2); treatment: 10 pre, 17 post
    # (trend +2 plus effect +5)
    for i in range(100):
        rows.append((0, 0, 10.0))
        rows.append((0, 1, 12.0))
        rows.append((1, 0, 10.0))
        rows.append((1, 1, 17.0))
    df = spark.createDataFrame(rows, ["g", "p", "v"])
    r = diff_in_diff(df, "g", "p", "v").collect()[0]
    assert r.did == pytest.approx(5.0)
    assert r.mean_c_post == pytest.approx(12.0)
    # the naive post comparison would report 5 too here, but with a
    # control baseline shift it wouldn't:
    rows2 = [(g, p, v + (3.0 if g == 0 else 0.0)) for g, p, v in rows]
    r2 = diff_in_diff(spark.createDataFrame(rows2, ["g", "p", "v"]),
                      "g", "p", "v").collect()[0]
    assert r2.did == pytest.approx(5.0)  # DiD unaffected by group offset


def test_did_empty_cell_nulls(spark):
    df = spark.createDataFrame(
        [(0, 0, 1.0), (1, 0, 2.0), (1, 1, 3.0)], ["g", "p", "v"]
    )
    r = diff_in_diff(df, "g", "p", "v").collect()[0]
    assert r.did is None  # control-post cell empty


def test_trimmed_mean_removes_tails(spark):
    rows = [(float(v),) for v in range(1, 101)] + [(10_000.0,)] * 3
    df = spark.createDataFrame(rows, ["v"])
    r = trimmed_mean(df, "v", trim=0.05, lo=0.0, hi=20_000.0,
                     bins=4096).collect()[0]
    assert r.n == 103
    assert r.n_kept < 103          # tails trimmed
    assert 40 < r.tmean < 60       # the 10k outliers are gone
    plain = sum(v for (v,) in rows) / len(rows)
    assert plain > 300             # the plain mean is wrecked


def test_trimmed_mean_rejects_bad_trim(spark):
    df = spark.createDataFrame([(1.0,)], ["v"])
    with pytest.raises(ValueError):
        trimmed_mean(df, "v", trim=0.5, lo=0.0, hi=1.0)
