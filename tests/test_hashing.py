"""portable_hash64: the Spark column, the DuckDB SQL fragment, and the
round-7 Python mirror must agree bit-for-bit — every guarded local tier
(MIS, coloring, matching, percolation sampling) rides on this."""

import duckdb
from pyspark.sql import functions as F

from polars_grouper_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_py,
    portable_hash64_sql,
)

SAMPLES = [
    "a", "", "node|0", "P123|S456|perc", "ünïcödé|7", "x" * 300,
    "m17|m3|42", "tab\tand\nnewline",
]


def test_python_mirror_matches_spark_column(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["s"])
    got = {
        r["s"]: r["h"]
        for r in df.select("s", portable_hash64(F.col("s")).alias("h")).collect()
    }
    for s in SAMPLES:
        assert got[s] == portable_hash64_py(s), f"mirror mismatch for {s!r}"


def test_python_mirror_matches_duckdb_sql():
    con = duckdb.connect()
    frag = portable_hash64_sql("?")
    for s in SAMPLES:
        want = con.execute(f"SELECT {frag}", [s]).fetchone()[0]
        assert want == portable_hash64_py(s), f"sql mismatch for {s!r}"
