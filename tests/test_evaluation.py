"""Evaluation metrics vs brute-force Python replays on tiny inputs.

The module's determinism contract: per-rank float terms micro-quantize
to longs (1e8 scale) and sum exactly; final values are single double
divisions with no engine-side rounding — so the expected values here
replay the SAME quantization in Python.
"""

import math

from pyspark.sql import functions as F

from polars_grouper_spark.functions.evaluation import (
    average_precision,
    calibration_bins,
    cohens_kappa,
    dist_entropy,
    gini_coefficient,
    ndcg_at_k,
    roc_auc,
)


def _micro(x: float) -> int:
    return int(math.floor(x * 1e8 + 0.5))  # HALF_UP, as both engines


def _brute_auc(pairs):
    pos = [s for s, l in pairs if l == 1]
    neg = [s for s, l in pairs if l == 0]
    wins = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    )
    return wins / (len(pos) * len(neg))


def test_roc_auc_matches_pairwise(spark):
    pairs = [
        (0.9, 1), (0.8, 1), (0.8, 0), (0.7, 0), (0.6, 1),
        (0.5, 0), (0.5, 0), (0.4, 1), (0.3, 0), (0.2, 0),
    ]
    df = spark.createDataFrame(pairs, "score double, label int")
    got = roc_auc(df, "score", "label").first()
    assert got["n_pos"] == 4 and got["n_neg"] == 6
    assert got["auc"] == _brute_auc(pairs)


def test_roc_auc_degenerate_group_is_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 1), ("b", 1.0, 1), ("b", 2.0, 0)],
        "g string, score double, label int",
    )
    rows = {r["g"]: r for r in roc_auc(df, "score", "label", by=["g"]).collect()}
    assert rows["a"]["auc"] is None
    assert rows["b"]["auc"] == 0.0  # the single positive scores LOWER


def test_average_precision_known_value(spark):
    # ranking (by score desc): labels 1,0,1,0,1 -> AP = mean(1/1, 2/3, 3/5)
    rows = [(5, 0.9, 1), (4, 0.8, 0), (3, 0.7, 1), (2, 0.6, 0), (1, 0.5, 1)]
    df = spark.createDataFrame(rows, "id int, score double, label int")
    got = average_precision(df, "score", "label", "id").first()
    want = (_micro(1.0) + _micro(2 / 3) + _micro(3 / 5)) / 1e8 / 3
    assert got["avg_prec"] == want and got["n_pos"] == 3 and got["n"] == 5


def test_ndcg_perfect_ranking_is_one(spark):
    rows = [(1, 5.0, 5), (2, 4.0, 4), (3, 3.0, 3), (4, 2.0, 2)]
    df = spark.createDataFrame(
        [("q",) + r for r in rows], "q string, id int, score double, rel int"
    )
    got = ndcg_at_k(df, "q", "id", "score", "rel", k=3).first()
    assert got["ndcg"] == 1.0 and got["dcg"] == got["idcg"]


def test_ndcg_known_value(spark):
    # predicted order by score: rel 0, 3, 1 ; ideal: 3, 1, 0
    df = spark.createDataFrame(
        [("q", 1, 9.0, 0), ("q", 2, 8.0, 3), ("q", 3, 7.0, 1)],
        "q string, id int, score double, rel int",
    )
    got = ndcg_at_k(df, "q", "id", "score", "rel", k=3).first()
    dcg = (
        _micro(0.0) + _micro(3 / math.log2(3)) + _micro(1 / math.log2(4))
    ) / 1e8
    idcg = (_micro(3 / math.log2(2)) + _micro(1 / math.log2(3))) / 1e8
    assert got["dcg"] == dcg
    assert got["idcg"] == idcg
    assert got["ndcg"] == dcg / idcg


def test_calibration_bins(spark):
    rows = [(0.05, 0), (0.08, 0), (0.95, 1), (0.92, 1), (1.0, 1), (0.55, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {r["bin"]: r for r in calibration_bins(df, "score", "label").collect()}
    assert set(got) == {0, 5, 9}
    assert got[9]["n"] == 3 and got[9]["pos_rate"] == 1.0  # 1.0 clamps in
    assert got[0]["n"] == 2 and got[0]["pos_rate"] == 0.0
    assert got[0]["mean_score"] == (_micro(0.05) + _micro(0.08)) / 1e8 / 2


def test_gini_extremes(spark):
    equal = spark.createDataFrame([(10,)] * 5, "v long")
    assert gini_coefficient(equal, "v").first()["gini"] == 0.0
    # all mass on one holder of n: G -> (n-1)/n
    conc = spark.createDataFrame([(0,), (0,), (0,), (100,)], "v long")
    assert gini_coefficient(conc, "v").first()["gini"] == 3 / 4


def test_gini_brute(spark):
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    s = sorted(vals)
    n, tot = len(s), sum(s)
    want = (2 * sum((i + 1) * x for i, x in enumerate(s)) - (n + 1) * tot) / (
        n * tot
    )
    assert gini_coefficient(df, "v").first()["gini"] == want


def test_cohens_kappa_known(spark):
    # classic 2x2: a=yes/no rater agreement
    rows = [("y", "y")] * 20 + [("n", "n")] * 15 + [("y", "n")] * 5 + [
        ("n", "y")
    ] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    got = cohens_kappa(df, "a", "b").first()
    n = 50
    agree = 35
    pe = (25 * 30 + 25 * 20)  # row marginals x col marginals
    assert got["n"] == n and got["n_agree"] == agree
    assert got["kappa"] == (n * agree - pe) / (n * n - pe)


def test_cohens_kappa_perfect_agreement(spark):
    df = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("z", "z")], "a string, b string"
    )
    assert cohens_kappa(df, "a", "b").first()["kappa"] == 1.0


def test_entropy_uniform_and_point(spark):
    df = spark.createDataFrame(
        [("u", "a"), ("u", "b"), ("u", "c"), ("u", "d"), ("v", "a"), ("v", "a")],
        "g string, e string",
    )
    got = {r["g"]: r for r in dist_entropy(df, "e", by=["g"]).collect()}
    assert got["u"]["entropy"] == 4 * _micro(0.25 * math.log(4)) / 1e8
    assert got["v"]["entropy"] == 0.0
    assert got["u"]["n_distinct"] == 4 and got["v"]["n"] == 2


def test_roc_auc_group_shuffle_invariance(spark):
    # repartitioning must not change any metric value
    rows = [(i % 3, float((i * 37) % 101), (i * 7) % 2) for i in range(300)]
    df = spark.createDataFrame(rows, "g int, score double, label int")
    a = sorted(map(tuple, roc_auc(df, "score", "label", by=["g"]).collect()))
    b = sorted(
        map(
            tuple,
            roc_auc(
                df.repartition(17, F.col("score")), "score", "label", by=["g"]
            ).collect(),
        )
    )
    assert a == b


def test_chi_square_independent_is_zero(spark):
    from polars_grouper_spark.functions.evaluation import chi_square

    # perfectly proportional table -> chi2 == 0
    rows = []
    for a, na in (("x", 2), ("y", 3)):
        for b, nb in (("p", 4), ("q", 1)):
            rows += [(a, b)] * (na * nb)
    df = spark.createDataFrame(rows, "a string, b string")
    got = chi_square(df, "a", "b").first()
    assert got["n"] == 25 and got["dof"] == 1
    assert got["chi2"] == 0.0


def test_chi_square_known_2x2(spark):
    from polars_grouper_spark.functions.evaluation import chi_square

    # 2x2: [[10, 20], [30, 40]]
    rows = (
        [("a", "p")] * 10 + [("a", "q")] * 20
        + [("b", "p")] * 30 + [("b", "q")] * 40
    )
    df = spark.createDataFrame(rows, "a string, b string")
    got = chi_square(df, "a", "b").first()
    n = 100
    micro_sum = 0
    for o, ra, cb in ((10, 30, 40), (20, 30, 60), (30, 70, 40), (40, 70, 60)):
        e = ra * cb / n
        micro_sum += int(math.floor((o - e) ** 2 / e * 1e6 + 0.5))
    assert got["dof"] == 1 and got["chi2"] == micro_sum / 1e6
    # sanity vs the closed form n(ad-bc)^2 / (marginal product)
    assert abs(got["chi2"] - 100 * (10 * 40 - 20 * 30) ** 2 / (30 * 70 * 40 * 60)) < 1e-5


def test_mutual_information_bounds(spark):
    from polars_grouper_spark.functions.evaluation import mutual_information

    # independent -> 0; identical -> ln(K)
    indep = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "pq" for _ in range(5)],
        "a string, b string",
    )
    assert mutual_information(indep, "a", "b").first()["mi"] == 0.0
    ident = spark.createDataFrame(
        [(c, c) for c in "xyz" for _ in range(4)], "a string, b string"
    )
    got = mutual_information(ident, "a", "b").first()["mi"]
    assert abs(got - math.log(3)) < 1e-6


def test_rbo_identical_rankings_close_to_one(spark):
    from polars_grouper_spark.functions.evaluation import rank_biased_overlap

    df = spark.createDataFrame(
        [(i, 100.0 - i) for i in range(30)], "id long, score double"
    )
    got = rank_biased_overlap(df, df, "id", "score", p=0.9, depth=30).first()
    # truncated RBO of identical lists = (1-p) * sum p^(d-1) = 1 - p^depth
    want = sum(
        int(math.floor(0.9 ** (d - 1) * 1e8 + 0.5)) for d in range(1, 31)
    ) / 1e8 * (1.0 - 0.9)  # (1.0 - 0.9) != 0.1 in floats; the module
    # embeds exactly this Python value in both engines
    assert got["rbo"] == want and got["n_common"] == 30
    assert abs(got["rbo"] - (1 - 0.9**30)) < 1e-5


def test_rbo_disjoint_rankings_is_zero(spark):
    from polars_grouper_spark.functions.evaluation import rank_biased_overlap

    a = spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, score double")
    b = spark.createDataFrame(
        [(i + 100, float(i)) for i in range(10)], "id long, score double"
    )
    got = rank_biased_overlap(a, b, "id", "score", p=0.9, depth=10).first()
    assert got["rbo"] == 0.0 and got["n_common"] == 0


def test_welch_ttest_known(spark):
    from polars_grouper_spark.functions.experiment import welch_ttest

    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [2.0, 4.0, 6.0, 8.0]
    a = spark.createDataFrame([(v,) for v in xs], "value double")
    b = spark.createDataFrame([(v,) for v in ys], "value double")
    got = welch_ttest(a, b, "value").first()
    import statistics

    ma, mb = statistics.mean(xs), statistics.mean(ys)
    va, vb = statistics.variance(xs), statistics.variance(ys)
    se = va / len(xs) + vb / len(ys)
    t = (ma - mb) / math.sqrt(se)
    dof = se * se / (
        (va / len(xs)) ** 2 / (len(xs) - 1) + (vb / len(ys)) ** 2 / (len(ys) - 1)
    )
    assert got["mean_a"] == ma and got["mean_b"] == mb
    assert abs(got["t"] - t) < 1e-9 and abs(got["dof"] - dof) < 1e-9


def test_welch_ttest_tiny_side_is_null(spark):
    from polars_grouper_spark.functions.experiment import welch_ttest

    a = spark.createDataFrame([(1.0,)], "value double")
    b = spark.createDataFrame([(1.0,), (2.0,)], "value double")
    got = welch_ttest(a, b, "value").first()
    assert got["t"] is None and got["dof"] is None


def test_precision_threshold_sweep(spark):
    from polars_grouper_spark.functions.evaluation import precision_threshold

    # ranking by score desc: labels 1,1,0,1,0,0 (ids break no ties here)
    rows = [(1, 6.0, 1), (2, 5.0, 1), (3, 4.0, 0), (4, 3.0, 1), (5, 2.0, 0), (6, 1.0, 0)]
    df = spark.createDataFrame(rows, "id long, score double, label int")
    # precision at k: 1, 1, 2/3, 3/4, 3/5, 1/2 ; target 3/4 -> largest k=4
    got = precision_threshold(df, "score", "label", "id", 3, 4).first()
    assert got["n_kept"] == 4 and got["n_pos_kept"] == 3
    assert got["threshold"] == 3.0
    assert got["precision"] == 3 / 4 and got["recall"] == 1.0
    # impossible target: the top-ranked row is negative, so no prefix
    # can reach 100% precision -> degenerate all-drop row
    neg_top = spark.createDataFrame(
        [(1, 9.0, 0), (2, 8.0, 1)], "id long, score double, label int"
    )
    none = precision_threshold(neg_top, "score", "label", "id", 1, 1).first()
    assert none["n_kept"] == 0 and none["threshold"] is None


def test_lift_table_known(spark):
    from polars_grouper_spark.functions.evaluation import lift_table

    # 20 rows, positives concentrated in the top quarter of scores
    rows = [(i, 100.0 - i, 1 if i < 5 else 0) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, score double, label int")
    got = {r["bucket"]: r for r in
           lift_table(df, "score", "label", "id", n_buckets=4).collect()}
    assert [got[b]["n"] for b in (1, 2, 3, 4)] == [5, 5, 5, 5]
    assert got[1]["n_pos"] == 5 and got[2]["n_pos"] == 0
    assert got[1]["capture_rate"] == 1.0
    assert got[1]["lift"] == 4.0  # all positives in the top quartile
    assert got[4]["cum_n"] == 20 and got[4]["capture_rate"] == 1.0
