"""Round-5 batch 34: graph growth, peak rate."""

from __future__ import annotations

import pytest


def test_graph_growth_identities(spark):
    import __spark_entry__ as em

    r = em.queries()["graph_growth_sp"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.n_edges_old > 0 and r.n_edges_new > 0
    assert r.edge_growth_ratio == pytest.approx(
        r.n_edges_new / r.n_edges_old
    )
    # new nodes can only come attached to new edges
    assert r.n_nodes_new <= 2 * r.n_edges_new


def test_peak_rate_top20_ordering(spark):
    import __spark_entry__ as em

    rows = em.queries()["peak_rate_users"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert 1 <= len(rows) <= 20  # sf0.001 has only 15 users
    peaks = [r.peak_per_minute for r in rows]
    assert peaks == sorted(peaks, reverse=True)
    assert all(p >= 1 for p in peaks)
