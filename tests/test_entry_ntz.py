"""Regression: the driver environment decodes events.ts as TIMESTAMP_NTZ
(micros, no tz), not the nanos-long path local testdata takes.  Round-1
broke three query entries on that decode (unix_micros / withWatermark both
reject NTZ).  This test rebuilds an events dir whose ts is genuinely NTZ
and runs the affected __spark_entry__ queries end-to-end against it.
"""

import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture(scope="module")
def ntz_sf_dir(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("ntz_sf")
    ev = spark.read.parquet(f"{src}/events.parquet")
    if not isinstance(ev.schema["ts"].dataType, T.TimestampNTZType):
        # local decode is nanos-long (or already TIMESTAMP); force NTZ
        if dict(ev.dtypes).get("ts") == "bigint":
            ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    ev.coalesce(1).write.mode("overwrite").parquet(str(out / "events_dir"))
    # __spark_entry__ expects <dir>/events.parquet as a single path
    part = next((out / "events_dir").glob("*.parquet"))
    shutil.copy(part, out / "events.parquet")
    check = spark.read.parquet(str(out / "events.parquet"))
    assert isinstance(check.schema["ts"].dataType, T.TimestampNTZType)
    return str(out)


def test_asof_clicks_on_ntz_events(spark, ntz_sf_dir):
    import __spark_entry__ as E

    out = E.queries()["asof_clicks"](spark, ntz_sf_dir)
    rows = out.collect()
    assert rows
    assert out.columns == [
        "event_id", "user_id", "ts_us", "value", "click_value", "click_ts_us",
    ]
    for r in rows:
        if r["click_ts_us"] is not None:
            assert r["click_ts_us"] <= r["ts_us"]


def test_stream_dedup_on_ntz_events(spark, ntz_sf_dir):
    import __spark_entry__ as E

    out = E.queries()["stream_dedup"](spark, ntz_sf_dir)
    rows = {r["event_type"]: r["n_user_pairs"] for r in out.collect()}
    ev = spark.read.parquet(f"{ntz_sf_dir}/events.parquet")
    want = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert rows == want
