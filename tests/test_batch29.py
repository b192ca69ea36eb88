"""Round-5 batch 29: dedup yield, session gap sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_dedup_yield_consistency(spark):
    import __spark_entry__ as em

    r = em.queries()["dedup_yield"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    # internal consistency: removed = clustered - clusters; clusters
    # have at least 2 members each
    assert r.n_removed == r.n_clustered - r.n_clusters
    assert r.n_clustered >= 2 * r.n_clusters
    assert r.n_clustered <= r.n_docs
    assert (r.chars_removed > 0) == (r.n_removed > 0)


def test_session_gap_sweep_monotone(spark):
    import __spark_entry__ as em

    rows = {r.gap_minutes: r for r in
            em.queries()["session_gap_sweep"](
                spark, "/root/testdata/sf0.001"
            ).collect()}
    assert set(rows) == {15, 30, 60}
    # larger gaps merge sessions: counts can only fall
    assert rows[15].n_sessions >= rows[30].n_sessions >= rows[60].n_sessions
    assert rows[15].n_bounces >= rows[60].n_bounces
    assert all(r.n_bounces <= r.n_sessions for r in rows.values())
