"""Z-order layout — key arithmetic, DuckDB parity, and measured
file-pruning benefit of the clustered write."""

import duckdb
from pyspark.sql import functions as F

from polars_grouper_spark.plans.layout import (
    write_zordered,
    zorder_key,
    zorder_key_sql,
)


def test_interleave_known_bits(spark):
    """cells x=0b11, y=0b01 with 2 bits -> key = x bits at 0,2; y at 1,3
    = 0b0111 = 7."""
    df = spark.createDataFrame([(3, 1)], ["x", "y"])
    key = df.select(
        zorder_key([("x", 0, 4), ("y", 0, 4)], bits=2).alias("k")
    ).collect()[0]["k"]
    assert key == 0b0111


def test_locality_beats_single_sort(spark):
    """Points close in 2-D are close in z-key: the max key gap inside a
    small box is far below the global key range."""
    pts = [(i % 32, i // 32) for i in range(1024)]
    df = spark.createDataFrame(pts, ["x", "y"])
    keyed = df.select(
        "x", "y", zorder_key([("x", 0, 32), ("y", 0, 32)], bits=5).alias("k")
    )
    box = keyed.where("x < 4 AND y < 4").agg(
        F.min("k"), F.max("k")).collect()[0]
    # a 4x4 box at the origin occupies keys [0, 64): one compact run
    assert box[0] == 0 and box[1] < 64


def test_duckdb_parity(spark):
    rows = [(i, (7 * i) % 100) for i in range(200)]
    df = spark.createDataFrame(rows, ["a", "b"])
    dims = [("a", 0, 200), ("b", 0, 100)]
    got = sorted(
        r["k"] for r in df.select(zorder_key(dims, bits=6).alias("k")).collect()
    )
    vals = ",".join(f"({a},{b})" for a, b in rows)
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT {zorder_key_sql(dims, bits=6)} AS k "
            f"FROM (VALUES {vals}) t(a, b)"
        ).fetchall()
    )
    assert got == want


def test_zordered_write_prunes_files(spark, tmp_path):
    """A 2-D box predicate over the z-ordered layout touches a minority
    of files; the same data sorted by x alone needs (nearly) all files
    for a predicate on y."""
    n = 20_000
    df = spark.range(n).select(
        (F.col("id") % 141).alias("x"),
        F.floor(F.col("id") / 141).alias("y"),
        F.col("id").alias("payload"),
    )
    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, [("x", 0, 141), ("y", 0, 143)], bits=8, n_files=16)
    xpath = str(tmp_path / "x")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(xpath)

    def files_touched(path, cond):
        return (
            spark.read.parquet(path)
            .where(cond)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    cond = "x >= 10 AND x < 20 AND y >= 10 AND y < 20"
    z_files = files_touched(zpath, cond)
    x_files = files_touched(xpath, "y >= 10 AND y < 20")
    assert z_files <= 4  # compact z-runs: few files hold the box
    assert x_files >= 12  # x-sorted layout can't prune a y predicate


def test_zorder_degenerate_range_raises(spark):
    import pytest as _pytest

    from polars_grouper_spark.plans.layout import zorder_key, zorder_key_sql

    with _pytest.raises(ValueError, match="hi > lo"):
        zorder_key([("x", 5.0, 5.0)], bits=4)
    with _pytest.raises(ValueError, match="hi > lo"):
        zorder_key_sql([("x", 9.0, 1.0)], bits=4)
