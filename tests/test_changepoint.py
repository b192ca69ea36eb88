"""CUSUM change-point detection (operators/changepoint.py)."""

import datetime as dt

import duckdb
import pytest

from polars_grouper_spark.operators.changepoint import (
    cusum_alarms,
    cusum_alarms_sql,
)

T0 = dt.datetime(2024, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, v long")


def test_cusum_detects_shift_not_single_spike(spark):
    # steady at 50, one spike to 200, then a sustained shift to 90
    rows = (
        [(1, T0 + dt.timedelta(minutes=i), 50) for i in range(10)]
        + [(1, T0 + dt.timedelta(minutes=10), 200)]
        + [(1, T0 + dt.timedelta(minutes=11 + i), 50) for i in range(10)]
        + [(1, T0 + dt.timedelta(minutes=22 + i), 90) for i in range(10)]
    )
    out = cusum_alarms(
        _df(spark, rows), "user_id", "ts", "v",
        target=50, slack=10, threshold=200,
    ).collect()
    # the lone 200-spike adds 140 < 200: no alarm; the sustained 90s add
    # 30/step: alarm on the 7th shifted point (7*30=210 > 200)
    assert [r["direction"] for r in out] == ["up"]
    assert out[0]["value_q"] == 90


def test_cusum_down_direction_and_reset(spark):
    rows = [(1, T0 + dt.timedelta(minutes=i), 50) for i in range(5)] + [
        (1, T0 + dt.timedelta(minutes=5 + i), 10) for i in range(20)
    ]
    out = cusum_alarms(
        _df(spark, rows), "user_id", "ts", "v",
        target=50, slack=10, threshold=100,
    ).collect()
    dirs = [r["direction"] for r in out]
    assert set(dirs) == {"down"} and len(dirs) >= 2  # reset -> re-alarm


def test_cusum_matches_recursive_oracle_random(spark):
    import random

    random.seed(6)
    rows = []
    for u in range(8):
        for i in range(40):
            base = 50 + (30 if (u % 2 == 0 and i >= 20) else 0)
            rows.append(
                (u, T0 + dt.timedelta(minutes=i), base + random.randint(-8, 8))
            )
    got = sorted(map(tuple, cusum_alarms(
        _df(spark, rows), "user_id", "ts", "v",
        target=50, slack=10, threshold=120,
    ).collect()))
    vals = ", ".join(
        f"('{u}', {int(ts.timestamp() * 1e6)}, {v})" for u, ts, v in rows
    )
    want = sorted(tuple(r) for r in duckdb.sql(cusum_alarms_sql(
        f"SELECT * FROM (VALUES {vals}) t(key, ts_us, value_q)",
        target=50, slack=10, threshold=120,
    )).fetchall())
    assert len(got) > 0 and got == want


def test_cusum_validation(spark):
    with pytest.raises(ValueError, match="threshold"):
        cusum_alarms(
            _df(spark, [(1, T0, 5)]), "user_id", "ts", "v",
            target=0, slack=0, threshold=0,
        )
