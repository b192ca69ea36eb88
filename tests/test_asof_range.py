"""As-of and range joins: goldens, pandas ``merge_asof`` parity, and
broadcast/bucketed strategy parity."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from polars_grouper_spark import asof_join, range_join


def _quotes(spark):
    # (key, t, px): per-key quote history.
    rows = [
        ("a", 1, 10.0), ("a", 5, 11.0), ("a", 9, 12.0),
        ("b", 2, 20.0), ("b", 8, 21.0),
    ]
    return spark.createDataFrame(rows, ["k", "t", "px"])


def _trades(spark):
    rows = [
        ("a", 0, 100), ("a", 5, 101), ("a", 7, 102),
        ("b", 2, 200), ("b", 9, 201), ("c", 4, 300),
    ]
    return spark.createDataFrame(rows, ["k", "t", "qty"])


def test_asof_backward_golden(spark):
    out = asof_join(_trades(spark), _quotes(spark), on="t", by="k").collect()
    got = {(r["k"], r["t"]): (r["px"], r["t_right"]) for r in out}
    assert got == {
        ("a", 0): (None, None),      # no quote yet
        ("a", 5): (11.0, 5),         # equal timestamp matches (inclusive)
        ("a", 7): (11.0, 5),
        ("b", 2): (20.0, 2),
        ("b", 9): (21.0, 8),
        ("c", 4): (None, None),      # key absent from right
    }


def test_asof_forward_and_inner(spark):
    out = asof_join(
        _trades(spark), _quotes(spark), on="t", by="k",
        direction="forward", how="inner",
    ).collect()
    got = {(r["k"], r["t"]): r["t_right"] for r in out}
    # earliest quote at-or-after each trade; unmatched rows dropped.
    assert got == {("a", 0): 1, ("a", 5): 5, ("a", 7): 9, ("b", 2): 2}


def test_asof_tolerance(spark):
    out = asof_join(
        _trades(spark), _quotes(spark), on="t", by="k", tolerance=2
    ).collect()
    got = {(r["k"], r["t"]): r["t_right"] for r in out}
    # ("a", 7) matched t=5 within gap 2; ("b", 9) gap 1; stale matches null.
    assert got == {
        ("a", 0): None, ("a", 5): 5, ("a", 7): 5,
        ("b", 2): 2, ("b", 9): 8, ("c", 4): None,
    }


def test_asof_matches_pandas_merge_asof(spark):
    # Randomized parity against pandas' reference implementation.
    import random

    rng = random.Random(7)
    lrows = sorted(
        {(rng.choice("xyz"), rng.randrange(100)) for _ in range(120)}
    )
    rrows = sorted(
        {(rng.choice("xyz"), rng.randrange(100)) for _ in range(60)}
    )
    lpd = pd.DataFrame(lrows, columns=["k", "t"]).sort_values("t", kind="stable")
    rpd = pd.DataFrame(rrows, columns=["k", "t"]).assign(
        v=lambda d: d["t"] * 10
    ).sort_values("t", kind="stable")
    expect = pd.merge_asof(lpd, rpd, on="t", by="k", direction="backward")
    exp = {
        (r.k, r.t): None if pd.isna(r.v) else int(r.v)
        for r in expect.itertuples()
    }

    ldf = spark.createDataFrame(lpd)
    rdf = spark.createDataFrame(rpd)
    out = asof_join(ldf, rdf, on="t", by="k").collect()
    got = {(r["k"], r["t"]): r["v"] for r in out}
    assert got == exp


def test_asof_timestamp_interval_tolerance(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    mins = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
    quotes = spark.createDataFrame(
        [("a", mins(0), 1.0), ("a", mins(90), 2.0)], ["k", "ts", "px"]
    )
    trades = spark.createDataFrame(
        [("a", mins(30), 10), ("a", mins(200), 11)], ["k", "ts", "qty"]
    )
    out = asof_join(
        trades, quotes, on="ts", by="k",
        tolerance=F.expr("INTERVAL 1 HOUR"),
    ).collect()
    got = {r["qty"]: r["px"] for r in out}
    # trade at +30min matches quote at 0 (gap 30m <= 1h);
    # trade at +200min has latest quote at +90min (gap 110m) -> nulled.
    assert got == {10: 1.0, 11: None}


def _tiers(spark):
    rows = [("low", 0.0, 10.0), ("mid", 10.0, 50.0), ("high", 50.0, 100.0)]
    return spark.createDataFrame(rows, ["tier", "lo", "hi"])


def test_range_join_broadcast_golden(spark):
    facts = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 49.9), (4, 100.0), (5, 72.0)], ["id", "v"]
    )
    out = range_join(facts, _tiers(spark), "v")
    got = {r["id"]: r["tier"] for r in out.collect()}
    # closed="left": [lo, hi) — 10.0 lands in "mid", 100.0 unmatched.
    assert got == {1: "low", 2: "mid", 3: "mid", 5: "high"}

    left = range_join(facts, _tiers(spark), "v", how="left")
    got_left = {r["id"]: r["tier"] for r in left.collect()}
    assert got_left == {1: "low", 2: "mid", 3: "mid", 4: None, 5: "high"}


def test_range_join_closedness(spark):
    facts = spark.createDataFrame([(1, 10.0)], ["id", "v"])
    iv = spark.createDataFrame([("t", 0.0, 10.0)], ["tier", "lo", "hi"])
    assert range_join(facts, iv, "v", closed="left").count() == 0
    assert range_join(facts, iv, "v", closed="right").count() == 1
    assert range_join(facts, iv, "v", closed="both").count() == 1
    assert range_join(facts, iv, "v", closed="neither").count() == 0


def test_range_join_bucketed_parity(spark):
    import random

    rng = random.Random(11)
    facts = spark.createDataFrame(
        [(i, rng.uniform(0, 1000)) for i in range(500)], ["id", "v"]
    )
    ivs = []
    for j in range(40):
        lo = rng.uniform(0, 950)
        ivs.append((j, lo, lo + rng.uniform(1, 120)))
    intervals = spark.createDataFrame(ivs, ["iid", "lo", "hi"])

    base = {
        (r["id"], r["iid"])
        for r in range_join(facts, intervals, "v").collect()
    }
    for width in (7.0, 64.0, 500.0):
        bucketed = {
            (r["id"], r["iid"])
            for r in range_join(
                facts, intervals, "v", strategy="bucketed", bucket_width=width
            ).collect()
        }
        assert bucketed == base

    # left-join parity too (unmatched facts keep one null row).
    base_left = {
        (r["id"], r["iid"])
        for r in range_join(facts, intervals, "v", how="left").collect()
    }
    buck_left = {
        (r["id"], r["iid"])
        for r in range_join(
            facts, intervals, "v", how="left", strategy="bucketed", bucket_width=50.0
        ).collect()
    }
    assert buck_left == base_left


def test_range_join_broadcast_plan(spark):
    facts = spark.createDataFrame([(1, 5.0)], ["id", "v"])
    plan = range_join(facts, _tiers(spark), "v")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


# --- direction="nearest" --------------------------------------------------

def _nv(spark):
    from pyspark.sql import functions as F  # noqa: F401

    left = spark.createDataFrame(
        [("k", 10), ("k", 25), ("k", 40), ("k", 100)], ["key", "t"]
    )
    right = spark.createDataFrame(
        [("k", 8, "a"), ("k", 30, "b"), ("k", 41, "c")], ["key", "t", "val"]
    )
    return left, right


def test_asof_nearest_picks_closer_side(spark):
    from polars_grouper_spark import asof_join

    left, right = _nv(spark)
    out = {
        r["t"]: (r["val"], r["t_right"])
        for r in asof_join(left, right, on="t", by="key", direction="nearest").collect()
    }
    assert out[10] == ("a", 8)    # back gap 2 < fwd gap 20
    assert out[25] == ("b", 30)   # fwd gap 5 < back gap 17
    assert out[40] == ("c", 41)   # fwd gap 1 < back gap 10
    assert out[100] == ("c", 41)  # only backward exists


def test_asof_nearest_tie_prefers_backward(spark):
    from polars_grouper_spark import asof_join

    left = spark.createDataFrame([("k", 20)], ["key", "t"])
    right = spark.createDataFrame(
        [("k", 15, "back"), ("k", 25, "fwd")], ["key", "t", "val"]
    )
    row = asof_join(left, right, on="t", by="key", direction="nearest").first()
    assert (row["val"], row["t_right"]) == ("back", 15)


def test_asof_nearest_tolerance_and_inner(spark):
    from polars_grouper_spark import asof_join

    left, right = _nv(spark)
    out = {
        r["t"]: r["val"]
        for r in asof_join(
            left, right, on="t", by="key", direction="nearest", tolerance=5
        ).collect()
    }
    assert out == {10: "a", 25: "b", 40: "c", 100: None}  # 100 out of range
    inner = asof_join(
        left, right, on="t", by="key", direction="nearest", tolerance=5, how="inner"
    )
    assert inner.count() == 3


def test_asof_nearest_matches_pandas_merge_asof(spark):
    """Randomized check against pandas' own nearest implementation."""
    import pandas as pd

    from polars_grouper_spark import asof_join

    lt = [(k, 3 * i + (i % 5)) for k in ("a", "b") for i in range(40)]
    rt = [(k, 7 * i + (i % 3), float(i)) for k in ("a", "b") for i in range(20)]
    left = spark.createDataFrame(lt, ["key", "t"])
    right = spark.createDataFrame(rt, ["key", "t", "val"])

    got = {
        (r["key"], r["t"]): r["val"]
        for r in asof_join(left, right, on="t", by="key", direction="nearest").collect()
    }
    lp = pd.DataFrame(lt, columns=["key", "t"]).sort_values("t").reset_index(drop=True)
    rp = pd.DataFrame(rt, columns=["key", "t", "val"]).sort_values("t").reset_index(drop=True)
    mp = pd.merge_asof(lp, rp, on="t", by="key", direction="nearest")
    want = {(r.key, r.t): (None if pd.isna(r.val) else r.val) for r in mp.itertuples()}
    assert got == want


def test_asof_strict_excludes_equal_timestamps(spark):
    from polars_grouper_spark import asof_join

    left = spark.createDataFrame([("k", 20), ("k", 30)], ["key", "t"])
    right = spark.createDataFrame(
        [("k", 10, "early"), ("k", 20, "equal")], ["key", "t", "val"]
    )
    incl = {
        r["t"]: r["val"]
        for r in asof_join(left, right, on="t", by="key").collect()
    }
    strict = {
        r["t"]: r["val"]
        for r in asof_join(
            left, right, on="t", by="key", allow_exact_matches=False
        ).collect()
    }
    assert incl == {20: "equal", 30: "equal"}
    assert strict == {20: "early", 30: "equal"}  # equal-ts match excluded at 20


def test_asof_strict_matches_pandas_all_directions(spark):
    import pandas as pd

    from polars_grouper_spark import asof_join

    lt = [("a", 2 * i) for i in range(30)]
    rt = [("a", 3 * i, float(i)) for i in range(20)]  # many exact collisions
    left = spark.createDataFrame(lt, ["key", "t"])
    right = spark.createDataFrame(rt, ["key", "t", "val"])
    lp = pd.DataFrame(lt, columns=["key", "t"])
    rp = pd.DataFrame(rt, columns=["key", "t", "val"])

    for direction in ("backward", "forward", "nearest"):
        got = {
            r["t"]: r["val"]
            for r in asof_join(
                left, right, on="t", by="key", direction=direction,
                allow_exact_matches=False,
            ).collect()
        }
        mp = pd.merge_asof(
            lp.sort_values("t"), rp.sort_values("t"),
            on="t", by="key", direction=direction, allow_exact_matches=False,
        )
        want = {r.t: (None if pd.isna(r.val) else r.val) for r in mp.itertuples()}
        assert got == want, direction
