"""Oracle dtype hygiene: no DuckDB HUGEINT may reach a final projection.

Root cause of the round-5 driver hash mismatches (`user_survival`,
`psi_drift_events`, `user_coverage`): DuckDB widens ``sum(BIGINT)`` /
``sum(INT)`` to HUGEINT (int128).  The local gate's ``fetchall()``
converts HUGEINT to a Python int — invisible — but a pandas-side fetch
(``.df()``, the driver's path) converts HUGEINT to float64, so the
value renders ``300.0`` where Spark's int64 renders ``300`` — a
guaranteed hash mismatch even when every value is equal.  The
correlation was exact: every driver-checked oracle emitting HUGEINT was
red, every one without was green (DECIMAL outputs pass — two green
driver rows — so only HUGEINT is banned).

This test binds every registry oracle against the sf0.001 parquet views
(binding resolves output types without executing the query) and fails
if any output column is HUGEINT/UHUGEINT.  Fix at the generator: wrap
the aggregate in ``CAST(... AS BIGINT)``.
"""

import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402
from polars_grouper_spark.sources import TABLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

BANNED = {"HUGEINT", "UHUGEINT"}


def test_no_oracle_emits_hugeint():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    offenders = {}
    for name, sql in entry_mod.oracle_sql().items():
        rel = con.sql(sql)  # binding only — resolves types, no execution
        bad = {
            c: str(ty)
            for c, ty in zip(rel.columns, rel.types)
            if str(ty) in BANNED
        }
        if bad:
            offenders[name] = bad
    assert offenders == {}, (
        "oracles emitting HUGEINT (driver hash hashes int128 as "
        f"decimal128, guaranteed red row): {offenders}"
    )
