"""Session-timezone independence of the naive-epoch helpers
(functions.timeutil) — the class behind the round-6 hostile-session
sweep findings: 10 of 304 queries emitted absolute epochs through
``unix_micros(ntz.cast("timestamp"))`` / ``date_trunc`` and silently
depended on ``spark.sql.session.timeZone``."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from polars_grouper_spark.functions.timeutil import (
    date_trunc_ntz,
    epoch_s_ntz,
    epoch_us_ntz,
    trunc_epoch_s_ntz,
)

ROWS = [
    ("2024-01-01 00:00:07.179575",),
    ("2024-03-10 06:59:59.999999",),  # straddles US DST spring-forward in UTC
    ("2024-07-04 23:30:00.000001",),
    ("1999-12-31 23:59:59.5",),
]
UNITS = ["minute", "hour", "day", "week", "month", "quarter", "year"]


@pytest.fixture()
def tz_flip(spark):
    """Temporarily run the session in America/New_York."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", old)


def _frame(spark):
    return spark.createDataFrame(ROWS, "s string").select(
        F.col("s").cast("timestamp_ntz").alias("ts"), "s"
    )


def test_epoch_helpers_match_duckdb_under_foreign_timezone(tz_flip):
    df = _frame(tz_flip).select(
        "s",
        epoch_us_ntz("ts").alias("us"),
        epoch_s_ntz("ts").alias("sec"),
        trunc_epoch_s_ntz("ts", 3600).alias("hr"),
    )
    got = {r["s"]: (r["us"], r["sec"], r["hr"]) for r in df.collect()}
    con = duckdb.connect()
    for s in [r[0] for r in ROWS]:
        us, sec, hr = con.sql(
            f"SELECT epoch_us(TIMESTAMP '{s}'),"
            f" CAST(FLOOR(epoch(TIMESTAMP '{s}')) AS BIGINT),"
            f" CAST(FLOOR(epoch(date_trunc('hour', TIMESTAMP '{s}'))) AS BIGINT)"
        ).fetchone()
        assert got[s] == (us, sec, hr), s


def test_date_trunc_ntz_matches_duckdb_under_foreign_timezone(tz_flip):
    sel = [date_trunc_ntz(u, "ts").cast("string").alias(u) for u in UNITS]
    got = {r["s"]: tuple(r[u] for u in UNITS)
           for r in _frame(tz_flip).select("s", *sel).collect()}
    con = duckdb.connect()
    for s in [r[0] for r in ROWS]:
        want = tuple(
            str(v)
            for v in con.sql(
                ", ".join(
                    f"SELECT CAST(date_trunc('{u}', TIMESTAMP '{s}') AS TIMESTAMP)"
                    if i == 0
                    else f"CAST(date_trunc('{u}', TIMESTAMP '{s}') AS TIMESTAMP)"
                    for i, u in enumerate(UNITS)
                )
            ).fetchone()
        )
        # Spark renders NTZ without trailing zero-fraction, as does duck's str()
        assert got[s] == want, (s, got[s], want)


def test_epoch_us_ntz_equals_unix_micros_under_utc(spark):
    """Under UTC the helper must be value-identical to the old idiom —
    the proof that green driver rows did not go stale."""
    df = _frame(spark).select(
        (
            epoch_us_ntz("ts")
            == F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("eq")
    )
    assert all(r["eq"] for r in df.collect())



# Random wall clocks across years (incl. DST transition windows) as
# microsecond offsets from 2000-01-01; one Spark job evaluates a whole
# batch, so examples stay cheap.
_OFFSETS = st.lists(
    st.integers(min_value=0, max_value=50 * 365 * 86400 * 1_000_000),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(_OFFSETS)
def test_epoch_us_ntz_matches_duckdb_for_random_timestamps(spark, offsets):
    """Property: for arbitrary naive wall clocks, epoch_us_ntz under a
    FOREIGN session zone equals DuckDB epoch_us (naive-as-UTC)."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.createDataFrame([(o,) for o in offsets], "off long").select(
            "off",
            epoch_us_ntz(
                F.expr(
                    "timestampadd(MICROSECOND, off, "
                    "TIMESTAMP_NTZ '2000-01-01 00:00:00')"
                )
            ).alias("us"),
        )
        got = {r["off"]: r["us"] for r in df.collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    base = 946_684_800_000_000  # 2000-01-01 epoch micros
    for off in offsets:
        assert got[off] == base + off, off
