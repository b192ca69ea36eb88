"""Round-5 batch 32: HHI, neighbor-degree curve."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_hhi_bounds_and_monopoly(spark):
    import __spark_entry__ as em

    rows = em.queries()["hhi_nations"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    for r in rows:
        # HHI in [1/n, 1]
        assert 1.0 / r.n_suppliers - 1e-9 <= r.hhi <= 1.0 + 1e-9
        if r.n_suppliers == 1:
            assert r.hhi == pytest.approx(1.0)


def test_knn_curve_star_graph(spark):
    from polars_grouper_spark.operators.degree_stats import _degrees

    # star: hub degree 4, leaves degree 1.  knn(1)=4, knn(4)=1
    edges = spark.createDataFrame(
        [("h", f"l{i}") for i in range(4)], ["src", "dst"]
    )
    deg = {r.node: r.degree for r in
           _degrees(edges, "src", "dst", False).collect()}
    assert deg["h"] == 4 and deg["l0"] == 1
    sym = edges.selectExpr("src as u", "dst as v").unionAll(
        edges.selectExpr("dst as u", "src as v")
    )
    du = {r.u: deg[r.u] for r in sym.collect()}
    # operator-level check through the entry fixture shape
    j = (
        sym.join(
            spark.createDataFrame(list(deg.items()), ["u", "du"]), "u"
        )
        .join(
            spark.createDataFrame(
                [(k, v) for k, v in deg.items()], ["v", "dv"]
            ),
            "v",
        )
        .groupBy("du")
        .agg((F.sum("dv") / F.count("*")).alias("knn"))
    )
    rows = {r.du: r.knn for r in j.collect()}
    assert rows[1] == pytest.approx(4.0)
    assert rows[4] == pytest.approx(1.0)
