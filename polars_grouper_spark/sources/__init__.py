"""Sources/sinks: testdata table loaders and IO helpers."""

from polars_grouper_spark.sources.tables import (
    TABLES,
    load_raw_schema,
    load_table,
    load_tables,
    register_views,
)

__all__ = ["TABLES", "load_raw_schema", "load_table", "load_tables", "register_views"]
