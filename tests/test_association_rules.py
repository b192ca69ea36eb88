"""Ported reference golden tests for graph_association_rules.

Reference: /root/reference/tests/test_graph_solver.py:192-364.
"""

from pyspark.sql import types as T

from polars_grouper_spark import graph_association_rules


def _tx(spark, txs, items, freqs):
    return spark.createDataFrame(
        list(zip(txs, items, freqs)),
        schema="transaction_id long, item_id string, frequency double",
    ).coalesce(1)


def test_basic_structure_and_dtypes(spark):
    df = _tx(spark, [1, 1, 1, 2, 2, 3], ["A", "B", "C", "B", "D", "A"], [1.0, 2.0, 1.0, 1.0, 1.0, 1.0])
    out = graph_association_rules(
        df, min_support=0.1, min_confidence=0.1, weighted=True
    )
    rows = out.collect()
    assert len(rows) > 0
    assert out.columns == [
        "item",
        "support",
        "lift_score",
        "pattern",
        "consequents",
        "confidence_scores",
    ]
    schema = dict(zip(out.columns, [f.dataType for f in out.schema.fields]))
    assert isinstance(schema["item"], T.StringType)
    assert isinstance(schema["support"], T.DoubleType)
    assert isinstance(schema["lift_score"], T.DoubleType)
    assert isinstance(schema["pattern"], T.LongType)
    assert isinstance(schema["consequents"], T.ArrayType)
    assert isinstance(schema["consequents"].elementType, T.StringType)
    assert isinstance(schema["confidence_scores"].elementType, T.DoubleType)


def test_empty_transactions(spark):
    df = spark.createDataFrame(
        [], schema="transaction_id long, item_id string, frequency double"
    )
    out = graph_association_rules(df)
    assert out.count() == 0


def test_single_item_no_associations(spark):
    df = _tx(spark, [1, 2, 3], ["A", "A", "A"], [1.0, 1.0, 1.0])
    rows = graph_association_rules(df).collect()
    assert len(rows) == 1
    assert rows[0]["item"] == "A"
    assert rows[0]["consequents"] == []
    assert rows[0]["confidence_scores"] == []


def test_min_support_threshold(spark):
    df = _tx(spark, [1, 1, 2, 3, 4], ["A", "B", "B", "C", "C"], [1.0] * 5)
    items = [r["item"] for r in graph_association_rules(df, min_support=0.5).collect()]
    assert "B" in items
    assert "C" in items
    assert "A" not in items


def test_weighted_vs_unweighted(spark):
    df = _tx(spark, [1, 1, 2, 2], ["A", "B", "A", "B"], [1.0, 2.0, 2.0, 1.0])
    w = {r["item"]: r["support"] for r in graph_association_rules(df, weighted=True).collect()}
    u = {r["item"]: r["support"] for r in graph_association_rules(df, weighted=False).collect()}
    assert any(w[k] != u[k] for k in w)


def test_max_itemset_size_skips_large_tx(spark):
    items = [f"item_{i}" for i in range(1, 52)]
    df = _tx(spark, [1] * 51, items, [1.0] * 51)
    rows = graph_association_rules(df, max_itemset_size=50, min_support=0.0, min_confidence=0.0).collect()
    # items still emitted (support filter passes) but no associations built
    assert len(rows) == 51
    assert all(r["consequents"] == [] for r in rows)


def test_null_handling(spark):
    df = spark.createDataFrame(
        [
            (1, "A", 1.0),
            (1, "B", None),
            (None, "C", 1.0),
            (2, None, 1.0),
            (2, "D", 1.0),
        ],
        schema="transaction_id long, item_id string, frequency double",
    ).coalesce(1)
    rows = graph_association_rules(df).collect()
    assert len(rows) > 0
    assert {r["item"] for r in rows} <= {"A", "D"}


def test_unweighted_confidence_quirk(spark):
    # unweighted confidence = support(antecedent)/total — ignores consequent.
    df = _tx(spark, [1, 1, 2, 2, 2], ["A", "B", "A", "B", "C"], [1.0] * 5)
    rows = graph_association_rules(df, min_support=0.0, min_confidence=0.0, weighted=False).collect()
    by_item = {r["item"]: r for r in rows}
    # A appears in 2 rows, total tx = 2 -> every A->x confidence = 1.0
    assert all(c == 1.0 for c in by_item["A"]["confidence_scores"])
    # C appears once -> C->x confidence = 0.5
    assert all(c == 0.5 for c in by_item["C"]["confidence_scores"])


def test_pattern_connectivity_and_numbering(spark):
    # Two disjoint co-occurrence groups -> patterns 1 and 2 in
    # first-appearance order.
    df = _tx(spark, [1, 1, 2, 2], ["A", "B", "X", "Y"], [1.0] * 4)
    rows = graph_association_rules(df, min_support=0.0, min_confidence=0.0).collect()
    pat = {r["item"]: r["pattern"] for r in rows}
    assert pat["A"] == pat["B"] == 1
    assert pat["X"] == pat["Y"] == 2


def test_duplicate_associations_accumulate(spark):
    # A,B co-occur in two transactions -> A->B appears twice in consequents.
    df = _tx(spark, [1, 1, 2, 2], ["A", "B", "A", "B"], [1.0] * 4)
    rows = graph_association_rules(df, min_support=0.0, min_confidence=0.0).collect()
    a = {r["item"]: r for r in rows}["A"]
    assert a["consequents"] == ["B", "B"]
    assert a["lift_score"] == sum(a["confidence_scores"])


def test_frequency_optional(spark):
    df = spark.createDataFrame(
        [(1, "A"), (1, "B")], schema="transaction_id long, item_id string"
    ).coalesce(1)
    rows = graph_association_rules(df, frequency_col=None, min_support=0.0, min_confidence=0.0).collect()
    assert {r["item"] for r in rows} == {"A", "B"}
