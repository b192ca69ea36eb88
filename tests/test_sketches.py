"""HyperLogLog with portable hashing — accuracy envelope, mergeability,
null handling, DuckDB estimate parity on both estimator branches."""

import duckdb
import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.sketches import (
    hll_distinct,
    hll_distinct_sql,
    hll_registers,
)


def spark_estimate(spark, values, b=12):
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    return hll_distinct(df, "v", b=b).collect()[0]["estimate"]


def duck_estimate(values, b=12):
    vals = ",".join(f"('{v}')" for v in values)
    sql = hll_distinct_sql(f"SELECT * FROM (VALUES {vals}) t(v)", "v", b)
    return duckdb.sql(sql).fetchall()[0][0]


def test_accuracy_within_envelope(spark):
    """b=12 -> ~1.6% standard error; 5% is a very safe bound at n=5000."""
    values = [f"item-{i % 5000}" for i in range(12000)]
    est = spark_estimate(spark, values)
    assert est == pytest.approx(5000, rel=0.05)


def test_linear_counting_small_range(spark):
    values = [f"x{i}" for i in range(200)]
    est = spark_estimate(spark, values)
    assert est == pytest.approx(200, rel=0.05)


def test_duckdb_parity_both_branches(spark):
    dense = [f"item-{i % 5000}" for i in range(8000)]
    sparse = [f"x{i}" for i in range(150)]
    assert spark_estimate(spark, dense) == duck_estimate(dense)
    assert spark_estimate(spark, sparse) == duck_estimate(sparse)


def test_duplicates_do_not_inflate(spark):
    once = [f"k{i}" for i in range(300)]
    thrice = once * 3
    assert spark_estimate(spark, once) == spark_estimate(spark, thrice)


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,), ("c",)], ["v"]
    )
    est = hll_distinct(df, "v").collect()[0]["estimate"]
    assert est == pytest.approx(3, rel=0.05)


def test_registers_merge_by_max(spark):
    """Union-then-max of two register tables equals the sketch of the
    union — the mergeable-summary contract."""
    a = spark.createDataFrame([(f"a{i}",) for i in range(500)], ["v"])
    b = spark.createDataFrame([(f"b{i}",) for i in range(500)], ["v"])
    both = a.unionAll(b)
    merged = (
        hll_registers(a, "v")
        .unionAll(hll_registers(b, "v"))
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    direct = hll_registers(both, "v")
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want


def test_b_validation(spark):
    df = spark.createDataFrame([("a",)], ["v"])
    with pytest.raises(ValueError, match="b must be"):
        hll_registers(df, "v", b=3)


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_cms_never_underestimates(spark):
    from polars_grouper_spark.functions.sketches import cms_counts, cms_estimate

    values = [f"k{i % 50}" for i in range(1000)]  # each key appears 20x
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    sketch = cms_counts(df, "v")
    probe = spark.createDataFrame([(f"k{i}",) for i in range(50)], ["v"])
    got = {r["item"]: r["est_count"] for r in cms_estimate(sketch, probe, "v").collect()}
    assert all(est >= 20 for est in got.values())
    # 4096 buckets, 50 keys: collisions are rare -> most estimates exact
    assert sum(1 for est in got.values() if est == 20) >= 45


def test_cms_absent_item_small(spark):
    from polars_grouper_spark.functions.sketches import cms_counts, cms_estimate

    df = spark.createDataFrame([(f"k{i}",) for i in range(200)], ["v"])
    sketch = cms_counts(df, "v")
    probe = spark.createDataFrame([("never-seen",)], ["v"])
    est = cms_estimate(sketch, probe, "v").collect()[0]["est_count"]
    assert est <= 1  # min over 4 rows of a sparse sketch


def test_cms_merge_by_sum(spark):
    from pyspark.sql import functions as F2
    from polars_grouper_spark.functions.sketches import cms_counts

    a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 3, ["v"])
    b = spark.createDataFrame([("x",)] * 2 + [("z",)] * 4, ["v"])
    merged = (
        cms_counts(a, "v")
        .unionAll(cms_counts(b, "v"))
        .groupBy("row", "bucket")
        .agg(F2.sum("cnt").alias("cnt"))
    )
    direct = cms_counts(a.unionAll(b), "v")
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want


# ---------------------------------------------------------------------------
# histogram quantiles
# ---------------------------------------------------------------------------


def test_hist_quantiles_uniform(spark):
    from polars_grouper_spark.functions.sketches import hist_quantiles

    df = spark.createDataFrame([(float(i),) for i in range(1000)], ["v"])
    got = {r["q"]: r["value"] for r in hist_quantiles(
        df, "v", [0.5, 0.9], lo=0.0, hi=1000.0, bins=1000).collect()}
    # exact grid: each value its own bin; median = 499 (ceil(0.5*1000)=500th)
    assert got[0.5] == 499.0
    assert got[0.9] == 899.0


def test_hist_quantiles_clamping_and_merge(spark):
    from pyspark.sql import functions as F2
    from polars_grouper_spark.functions.sketches import (
        hist_registers,
    )

    df = spark.createDataFrame([(-5.0,), (0.5,), (99.0,), (250.0,)], ["v"])
    regs = hist_registers(df, "v", lo=0.0, hi=100.0, bins=10)
    got = {r["bucket"]: r["cnt"] for r in regs.collect()}
    assert got[0] == 2  # -5 clamps into bin 0 alongside 0.5
    assert got[9] == 2  # 99 in last bin; 250 clamps into it
    # mergeability: sum of two halves == whole
    a = spark.createDataFrame([(float(i),) for i in range(50)], ["v"])
    b = spark.createDataFrame([(float(i),) for i in range(50, 100)], ["v"])
    merged = (
        hist_registers(a, "v", lo=0.0, hi=100.0, bins=20)
        .unionAll(hist_registers(b, "v", lo=0.0, hi=100.0, bins=20))
        .groupBy("bucket").agg(F2.sum("cnt").alias("cnt"))
    )
    direct = hist_registers(a.unionAll(b), "v", lo=0.0, hi=100.0, bins=20)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect()))


def test_hist_quantiles_duckdb_parity(spark):
    from polars_grouper_spark.functions.sketches import (
        hist_quantiles,
        hist_quantiles_sql,
    )

    vals = [((i * 37) % 500) / 7.0 for i in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = sorted(
        tuple(r) for r in hist_quantiles(
            df, "v", [0.1, 0.5, 0.95], lo=0.0, hi=80.0, bins=256).collect()
    )
    sql_vals = ",".join(f"({v!r})" for v in vals)
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            hist_quantiles_sql(
                f"SELECT * FROM (VALUES {sql_vals}) t(v)", "v",
                [0.1, 0.5, 0.95], lo=0.0, hi=80.0, bins=256,
            )
        ).fetchall()
    )
    assert got == want


def test_hll_by_group_accuracy_and_parity(spark):
    from polars_grouper_spark.functions.sketches import (
        hll_distinct_by,
        hll_distinct_by_sql,
    )

    rows = [("g1", f"a{i % 800}") for i in range(2000)] + [
        ("g2", f"b{i % 50}") for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r["key"]: r["estimate"] for r in hll_distinct_by(df, "g", "v").collect()}
    assert got["g1"] == pytest.approx(800, rel=0.05)
    assert got["g2"] == pytest.approx(50, rel=0.05)
    vals = ",".join(f"('{g}','{v}')" for g, v in rows)
    want = dict(
        duckdb.sql(
            hll_distinct_by_sql(f"SELECT * FROM (VALUES {vals}) t(g, v)", "g", "v")
        ).fetchall()
    )
    assert got == want


def test_cms_probe_param_mismatch_raises(spark):
    """ADVICE fix: probing with the wrong depth/width must fail loudly
    instead of silently underestimating via the 0-coalesce.  r5: the guard
    is now LAZY (raise_error inside the probe action, no second sketch
    scan) so the failure surfaces at collect() as a Spark runtime error."""
    import pytest as _pytest

    from polars_grouper_spark.functions.sketches import cms_counts, cms_estimate

    df = spark.createDataFrame([(f"v{i % 5}",) for i in range(50)], ["v"])
    probe = spark.createDataFrame([("v0",)], ["v"])
    sketch = cms_counts(df, "v", width_bits=10, depth=4)
    with _pytest.raises(Exception, match="depth mismatch"):
        cms_estimate(sketch, probe, "v", width_bits=10, depth=8).collect()
    with _pytest.raises(Exception, match="width mismatch"):
        cms_estimate(sketch, probe, "v", width_bits=2, depth=4).collect()


def test_bloom_never_false_negative_and_rejects_mismatch(spark):
    import pytest as _pytest

    from polars_grouper_spark.functions.sketches import bloom_bits, bloom_contains

    vals = spark.createDataFrame([(f"v{i}",) for i in range(200)], ["v"])
    bits = bloom_bits(vals, "v", m_bits=12, k=3)
    present = spark.createDataFrame([(f"v{i}",) for i in range(0, 200, 7)], ["v"])
    got = bloom_contains(bits, present, "v", m_bits=12, k=3).collect()
    assert all(r["maybe_present"] for r in got)  # no false negatives, ever
    with _pytest.raises(Exception, match="width mismatch"):
        bloom_contains(bits, present, "v", m_bits=8, k=3).collect()


def test_bloom_absent_items_mostly_rejected(spark):
    from polars_grouper_spark.functions.sketches import bloom_bits, bloom_contains

    vals = spark.createDataFrame([(f"v{i}",) for i in range(100)], ["v"])
    bits = bloom_bits(vals, "v", m_bits=16, k=4)  # sparse filter -> tiny FP rate
    absent = spark.createDataFrame([(f"nope{i}",) for i in range(50)], ["v"])
    got = bloom_contains(bits, absent, "v", m_bits=16, k=4).collect()
    fp = sum(1 for r in got if r["maybe_present"])
    assert fp <= 2  # (kn/m)^k ~ 4e-9 here; allow huge slack


def test_hll_union_equals_distinct_over_concat(spark):
    from polars_grouper_spark.functions.sketches import (
        hll_distinct,
        hll_union_distinct,
    )

    a = spark.createDataFrame([(i % 40,) for i in range(200)], ["k"])
    b = spark.createDataFrame([(i % 55 + 20,) for i in range(200)], ["k"])
    merged = hll_union_distinct([(a, "k"), (b, "k")], b=10).collect()[0]["estimate"]
    direct = hll_distinct(a.unionAll(b), "k", b=10).collect()[0]["estimate"]
    assert merged == direct  # register max is associative: bit-identical


def test_hist_quantiles_by_hand_computed(spark):
    from polars_grouper_spark.functions.sketches import hist_quantiles_by

    rows = [("a", float(v)) for v in range(1, 101)] + [("b", 50.0)] * 10
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        (r["key"], r["q"]): r["value"]
        for r in hist_quantiles_by(
            df, "k", "v", [0.5, 0.99], lo=0.0, hi=100.0, bins=100
        ).collect()
    }
    # group a: uniform 1..100, bin width 1 -> median bucket left edge 50.0
    assert got[("a", 0.5)] == 50.0
    assert got[("a", 0.99)] == 99.0
    # group b: constant 50 -> every quantile in the 50-bucket
    assert got[("b", 0.5)] == 50.0 and got[("b", 0.99)] == 50.0


def test_hll_cube_matches_per_set_estimates_and_truth(spark):
    """Cube register-merge must equal computing each grouping set's HLL
    independently (merge-correctness), and estimates must sit near the
    exact distinct counts."""
    from polars_grouper_spark.functions.sketches import hll_cube, hll_distinct_by

    rows = [
        (f"d{i % 3}", f"t{i % 2}", f"u{i % 47}") for i in range(500)
    ]
    df = spark.createDataFrame(rows, "d string, t string, u string")
    cube = {
        (r["d"], r["t"]): r["estimate"]
        for r in hll_cube(df, ["d", "t"], "u", b=10).collect()
    }
    assert len(cube) == 3 * 2 + 3 + 2 + 1  # all grouping sets
    # merge-correctness vs the independent per-set operator
    per_d = {
        (r["key"], None): r["estimate"]
        for r in hll_distinct_by(df, "d", "u", b=10).collect()
    }
    for k, v in per_d.items():
        assert cube[k] == v
    # accuracy: each (d, t) cell has ~24 distinct users (47 spread over 6)
    exact = {}
    for d, t, u in rows:
        exact.setdefault((d, t), set()).add(u)
    for k, s in exact.items():
        assert abs(cube[k] - len(s)) / len(s) < 0.15
