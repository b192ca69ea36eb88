"""Plan utilities: iteration hygiene, explain capture, convergence checks."""

from polars_grouper_spark.plans.iteration import fingerprint, truncate_lineage

__all__ = ["fingerprint", "truncate_lineage"]
