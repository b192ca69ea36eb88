"""Generic sources/sinks beyond the testdata registry.

Readers keep schemas explicit (no sampling-based inference jobs on huge
inputs) and writers keep layout partition-pruning-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True, sep: str = ","
) -> DataFrame:
    """CSV with an explicit schema — schema inference on a 100 TB input is
    a full extra scan; never rely on it."""
    return spark.read.schema(schema).option("header", header).option("sep", sep).csv(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet sink.

    ``partition_by`` columns become directory partitions — readers get
    partition pruning for free on equality/range filters.  Bound file
    sizes with ``max_records_per_file`` instead of coalescing (coalesce
    collapses upstream parallelism).
    """
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
