"""Feature prep: rank normalization + class centroids (functions/features.py)."""

import duckdb
import pytest

from polars_grouper_spark.functions.features import (
    class_centroids,
    class_centroids_sql,
    rank_normalize,
    rank_normalize_sql,
)


def test_rank_normalize_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "g", 10.0), (2, "g", 20.0), (3, "g", 20.0), (4, "g", 40.0)],
        "id long, grp string, value double",
    )
    got = {r["id"]: (r["pct_rank"], r["bin"]) for r in
           rank_normalize(df, "grp", "value", "id", n_bins=2).collect()}
    # total order (value, id): 10 < 20(id2) < 20(id3) < 40
    assert got == {
        1: (0.0, 1), 2: (round(1 / 3, 6), 1),
        3: (round(2 / 3, 6), 2), 4: (1.0, 2),
    }


def test_rank_normalize_partitioning_invariant(spark):
    rows = [(i, f"g{i % 3}", float((i * 37) % 100)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, grp string, value double")
    a = sorted(map(tuple, rank_normalize(df, "grp", "value", "id").collect()))
    b = sorted(
        map(tuple, rank_normalize(df.repartition(13), "grp", "value", "id").collect())
    )
    assert a == b
    vals = ", ".join(f"({i},'{g}',{v})" for i, g, v in rows)
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            rank_normalize_sql(f"SELECT * FROM (VALUES {vals}) t(id, grp, value)")
        ).fetchall()
    )
    assert a == want


def test_rank_normalize_bins_validation(spark):
    df = spark.createDataFrame([(1, "g", 1.0)], "id long, grp string, value double")
    with pytest.raises(ValueError, match="n_bins"):
        rank_normalize(df, "grp", "value", "id", n_bins=0)


def test_class_centroids_hand_computed(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0, 6.0]), ("b", [10.0, 0.0])],
        "label string, embedding array<double>",
    )
    got = {(r["label"], r["dim"]): r["mean"] for r in
           class_centroids(df, "label").collect()}
    assert got == {
        ("a", 0): 2.0, ("a", 1): 4.0, ("b", 0): 10.0, ("b", 1): 0.0,
    }


def test_class_centroids_duckdb_parity(spark):
    rows = [(f"l{i % 4}", [float((i * j) % 7) / 3.0 for j in range(5)])
            for i in range(100)]
    df = spark.createDataFrame(rows, "label string, embedding array<double>")
    got = sorted(map(tuple, class_centroids(df, "label").collect()))
    vals = ", ".join(
        "('{}', [{}])".format(l, ", ".join(map(str, v))) for l, v in rows
    )
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            class_centroids_sql(
                f"SELECT * FROM (VALUES {vals}) t(label, embedding)",
                "label",
                "embedding",
            )
        ).fetchall()
    )
    assert got == want


def test_nearest_centroid_confusion_separable_clusters(spark):
    """On well-separated clusters the classifier must be perfect: the
    confusion matrix is diagonal."""
    import numpy as np

    from polars_grouper_spark.functions.features import (
        nearest_centroid_confusion,
    )

    rng = np.random.RandomState(3)
    anchors = {"a": [10.0, 0.0], "b": [0.0, 10.0], "c": [-10.0, -10.0]}
    rows = []
    for i in range(150):
        lab = "abc"[i % 3]
        ax, ay = anchors[lab]
        rows.append(
            (i, lab, [float(ax + rng.randn() * 0.2), float(ay + rng.randn() * 0.2)])
        )
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    got = {(r["true_label"], r["pred_label"]): r["n"]
           for r in nearest_centroid_confusion(df, "label").collect()}
    assert got == {("a", "a"): 50, ("b", "b"): 50, ("c", "c"): 50}


def test_nearest_centroid_confusion_matches_duckdb(spark):
    import duckdb
    import numpy as np

    from polars_grouper_spark.functions.features import (
        nearest_centroid_confusion,
        nearest_centroid_confusion_sql,
    )

    rng = np.random.RandomState(5)
    rows = [
        (i, f"l{i % 3}", [float(x) for x in rng.randn(4)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    got = sorted(map(tuple, nearest_centroid_confusion(df, "label").collect()))
    vals = ", ".join(
        "({}, '{}', [{}])".format(i, l, ", ".join(map(str, v)))
        for i, l, v in rows
    )
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            nearest_centroid_confusion_sql(
                f"SELECT * FROM (VALUES {vals}) t(vec_id, label, embedding)",
                "label",
                "embedding",
                "vec_id",
            )
        ).fetchall()
    )
    assert got == want


def test_centroid_silhouette_separated_vs_mixed(spark):
    from polars_grouper_spark.functions.features import centroid_silhouette

    # two tight, well-separated clusters -> silhouette near 1
    sep = []
    for i in range(10):
        sep.append((i, 0, [0.0 + i * 0.001, 0.0]))
        sep.append((100 + i, 1, [1.0 + i * 0.001, 1.0]))
    df = spark.createDataFrame(sep, "vec_id long, label int, embedding array<float>")
    got = {r["label"]: r for r in centroid_silhouette(df, "label").collect()}
    assert got["0"]["n"] == 10 and got["1"]["n"] == 10
    assert got["0"]["mean_silhouette"] > 0.9
    # identical clusters -> silhouette ~ 0 (a == b)
    mixed = [(i, i % 2, [float(i % 5), 0.0]) for i in range(20)]
    dfm = spark.createDataFrame(
        mixed, "vec_id long, label int, embedding array<float>"
    )
    gm = {r["label"]: r for r in centroid_silhouette(dfm, "label").collect()}
    assert abs(gm["0"]["mean_silhouette"]) < 0.2


def test_centroid_silhouette_single_label_raises(spark):
    import pytest

    from polars_grouper_spark.functions.features import centroid_silhouette

    df = spark.createDataFrame(
        [(1, 0, [1.0]), (2, 0, [2.0])],
        "vec_id long, label int, embedding array<float>",
    )
    with pytest.raises(Exception, match="2 labels"):
        centroid_silhouette(df, "label").collect()
