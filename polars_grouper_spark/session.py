"""SparkSession factory tuned for this engine.

Single place where execution-relevant config lives so tests, bench and the
driver contract all run with the same settings.  Designed for a real cluster
(AQE on, Arrow on, sane shuffle sizing) while testing on ``local[N]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "polars-grouper-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Return the active SparkSession, or build one.

    Config notes (scale rationale):

    - AQE on: runtime coalescing of shuffle partitions, broadcast-join
      demotion/promotion and skew-join splitting — essential at 100 TB where
      static ``spark.sql.shuffle.partitions`` is always wrong for some stage.
    - Arrow on: every ``applyInPandas``/``mapInPandas`` kernel ships columnar
      batches instead of pickled rows.
    - UTC session timezone: deterministic timestamp semantics vs the DuckDB
      oracle.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "8"))
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    return builder.getOrCreate()
