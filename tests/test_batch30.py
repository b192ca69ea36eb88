"""Round-5 batch 30: funnel latency, capture-recapture."""

from __future__ import annotations

import pytest


def test_funnel_latency_quantiles_ordered(spark):
    import __spark_entry__ as em

    rows = {r.q: r.value for r in
            em.queries()["funnel_latency"](
                spark, "/root/testdata/sf0.001"
            ).collect()}
    assert set(rows) == {0.5, 0.9, 0.99}
    assert 0 <= rows[0.5] <= rows[0.9] <= rows[0.99]


def test_capture_recapture_identity_and_estimate(spark):
    import __spark_entry__ as em

    r = em.queries()["capture_recapture"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.m <= min(r.n1, r.n2)
    if r.m > 0:
        assert r.population_est == pytest.approx(r.n1 * r.n2 / r.m)
        # the estimate can't be below either observed sample
        assert r.population_est >= max(r.n1, r.n2)


def test_capture_recapture_textbook_numbers(spark):
    from pyspark.sql import functions as F

    # marked 100, recaptured 50, overlap 10 -> N = 500
    ev = []
    base = 915408000  # 1999-01-04 epoch
    week = 7 * 86400
    for u in range(100):
        ev.append((u, base + 10))
    for u in range(90, 140):
        ev.append((u, base + week + 10))
    df = spark.createDataFrame(ev, ["user_id", "t"]).select(
        "user_id", F.col("t").cast("timestamp").alias("ts"),
        F.lit("view").alias("event_type"),
    )
    w1 = df.where((F.col("ts") >= "1999-01-04") & (F.col("ts") < "1999-01-11")) \
        .select("user_id").distinct()
    w2 = df.where((F.col("ts") >= "1999-01-11") & (F.col("ts") < "1999-01-18")) \
        .select("user_id").distinct()
    n1, n2 = w1.count(), w2.count()
    m = w1.join(w2, "user_id").count()
    assert (n1, n2, m) == (100, 50, 10)
    assert n1 * n2 / m == pytest.approx(500.0)
