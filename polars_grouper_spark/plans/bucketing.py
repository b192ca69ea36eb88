"""Bucketed co-partitioning for shuffle-free iterative joins.

At 100 TB the dominant cost of PageRank/CC-style loops is re-shuffling the
edge set on the join key every round.  Writing the edges as a bucketed
table (``bucketBy(n, key)``) makes every subsequent equi-join on that key
shuffle-free on the bucketed side — Catalyst proves the partitioning
matches and elides the Exchange.

This module is the demonstration harness: ``bucket_table`` writes a
DataFrame bucketed, ``exchange_count`` counts Exchange operators in a
plan so tests (and SCALE.md claims) can assert the shuffle actually
disappeared.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame, SparkSession


def bucket_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> DataFrame:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table;
    returns the re-read table handle carrying the bucket metadata."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table_name)
    return spark.table(table_name)


def exchange_count(df: DataFrame) -> int:
    """Number of distinct Exchange (shuffle) operators in the physical plan.

    Counts the formatted explain's detail headers (``(n) Exchange``) so each
    operator is counted exactly once — the tree rendering repeats every
    operator a second time.  ``ReusedExchange`` is excluded (no new shuffle).
    """
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))


def co_bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two tables bucketed on the same key/bucket-count — shuffle-free."""
    return spark.table(left_table).join(spark.table(right_table), key)
