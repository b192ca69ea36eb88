"""Round-5 batch 31: ABC classification."""

from __future__ import annotations

import pytest


def test_abc_classes_partition_and_shares(spark):
    import __spark_entry__ as em

    rows = {r.abc_class: r for r in
            em.queries()["abc_parts"](
                spark, "/root/testdata/sf0.001"
            ).collect()}
    assert set(rows) == {"A", "B", "C"}
    shares = sum(r.revenue_share for r in rows.values())
    assert shares == pytest.approx(1.0, abs=1e-9)
    # A captures the big share with fewer parts than C
    assert rows["A"].revenue_share > rows["C"].revenue_share
    assert rows["A"].revenue_share >= 0.6
