"""Mimic the driver's correctness gate: run each queries() entry on Spark
and its oracle_sql() on DuckDB at sf0.01, compare row multisets with
columns sorted by name.

Usage: PYTHONPATH=/root/repo python scripts/check_oracle.py [sf_dir] [query ...]

Env:
  HOSTILE_SESSION=1 — build a bare driver-style SparkSession instead of
  the package's get_spark(): default confs (200 shuffle partitions, no
  AQE tuning), session timezone America/New_York.  A query that only
  passes under get_spark()'s confs is a latent driver-red row — this
  sweep exists to flush out partitioning/timezone-dependent results
  (the class behind the round-5 hash mismatches).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from polars_grouper_spark.session import get_spark  # noqa: E402
from polars_grouper_spark.sources import TABLES  # noqa: E402


def norm_rows(cols, rows, float_nd=9):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, float_nd)
                if v == -0.0:
                    v = 0.0
            if isinstance(v, bool):
                v = bool(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr), [cols[i] for i in idx]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if os.environ.get("HOSTILE_SESSION") == "1":
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-check-hostile")
            .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "8g")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} SPARK-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:28s} rows-only   n={len(srows):7d}  spark={t_spark:5.1f}s")
            continue
        t0 = time.time()
        try:
            rel = con.sql(oracles[name])
            dcols = [c for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} DUCK-ERROR  {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        t_duck = time.time() - t0
        sn, sc = norm_rows(scols, srows)
        dn, dc = norm_rows(dcols, drows)
        status = "OK" if (sn == dn and sc == dc) else "MISMATCH"
        print(
            f"{name:28s} {status:11s} n={len(srows):7d}/{len(drows):7d} "
            f"spark={t_spark:5.1f}s duck={t_duck:5.1f}s"
        )
        if status != "OK":
            failures.append(name)
            if sc != dc:
                print(f"    cols spark={sc}\n    cols duck ={dc}")
            sonly = [r for r in sn if r not in set(dn)][:3]
            donly = [r for r in dn if r not in set(sn)][:3]
            for r in sonly:
                print(f"    spark-only: {r}")
            for r in donly:
                print(f"    duck-only : {r}")
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
