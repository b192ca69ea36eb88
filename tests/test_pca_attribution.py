"""One-pass PCA covariance + driver eigensolve; multi-touch attribution."""

import numpy as np
import pytest

from polars_grouper_spark.functions.pca import (
    covariance_matrix,
    top_principal_component,
)
from polars_grouper_spark.operators.attribution import linear_attribution


def test_covariance_hand_computed(spark):
    # Two dims, perfectly correlated: cov matrix = [[var, var], [var, var]]
    df = spark.createDataFrame(
        [([1.0, 1.0],), ([2.0, 2.0],), ([3.0, 3.0],)], ["embedding"]
    )
    out = {
        (r["dim_i"], r["dim_j"]): r["cov"]
        for r in covariance_matrix(df).collect()
    }
    # population var of {1,2,3} = 2/3
    for k in [(0, 0), (0, 1), (1, 1)]:
        assert out[k] == pytest.approx(2.0 / 3.0, abs=1e-5)
    assert (1, 0) not in out  # upper triangle only


def test_covariance_matches_numpy(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(200, 5))
    df = spark.createDataFrame([(row.tolist(),) for row in x], ["embedding"])
    got = {
        (r["dim_i"], r["dim_j"]): r["cov"]
        for r in covariance_matrix(df, quant=1000).collect()
    }
    # Compare against numpy over the SAME quantization (floor(x*1000)),
    # computed with the same IEEE double multiply.
    want = np.cov(np.floor(x * 1000.0) / 1000.0, rowvar=False, bias=True)
    for (i, j), v in got.items():
        assert v == pytest.approx(want[i][j], abs=2e-6), (i, j)


def test_top_component_matches_numpy(spark):
    rng = np.random.default_rng(3)
    # Strong first component along a known direction.
    base = rng.normal(size=(300, 4))
    base[:, 0] *= 6.0
    x = base
    df = spark.createDataFrame([(row.tolist(),) for row in x], ["embedding"])
    cov = covariance_matrix(df, quant=1000, decimals=9)
    vec, val = top_principal_component(cov, 4)
    m = np.cov(np.floor(x * 1000.0) / 1000.0, rowvar=False, bias=True)
    w, v = np.linalg.eigh(m)
    expect = v[:, -1]
    k = int(np.argmax(np.abs(expect)))
    if expect[k] < 0:
        expect = -expect
    assert val == pytest.approx(w[-1], rel=1e-3)
    assert np.allclose(vec, expect, atol=1e-3)


def test_covariance_validation(spark):
    df = spark.createDataFrame([([1.0],)], ["embedding"])
    with pytest.raises(ValueError):
        covariance_matrix(df, quant=0)


def test_attribution_hand_computed(spark):
    conv = spark.createDataFrame(
        [("u", 100, "c1", 9.0), ("u", 200, "c2", 4.0), ("v", 100, "c3", 1.0)],
        ["user", "ts", "id", "value"],
    )
    touch = spark.createDataFrame(
        [("u", 90, "t1"), ("u", 95, "t2"), ("u", 150, "t3"), ("w", 90, "t4")],
        ["user", "ts", "id"],
    )
    out = {
        (r["conv_id"], r["touch_id"]): (r["n_touches"], r["credit"])
        for r in linear_attribution(
            conv, touch, "user", "ts", "id", "value", window_seconds=50
        ).collect()
    }
    # c1 (ts=100, window [50,100)): t1, t2 -> 4.5 each.
    # c2 (ts=200, window [150,200)): t3 only -> 4.0.
    # c3: user v has no touches -> absent.
    assert out == {
        ("c1", "t1"): (2, 4.5),
        ("c1", "t2"): (2, 4.5),
        ("c2", "t3"): (1, 4.0),
    }


def test_attribution_touch_at_conversion_instant_excluded(spark):
    conv = spark.createDataFrame([("u", 100, "c", 1.0)], ["user", "ts", "id", "value"])
    touch = spark.createDataFrame([("u", 100, "t")], ["user", "ts", "id"])
    out = linear_attribution(conv, touch, "user", "ts", "id", "value")
    assert out.count() == 0


def test_attribution_validation(spark):
    conv = spark.createDataFrame([("u", 1, "c", 1.0)], ["user", "ts", "id", "value"])
    with pytest.raises(ValueError):
        linear_attribution(conv, conv, "user", "ts", "id", "value", window_seconds=0)
