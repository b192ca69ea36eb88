"""benford_audit digit bucketing and frequent_triples vs brute force."""

import itertools
import math
from collections import Counter

from polars_grouper_spark.functions.validate import benford_audit
from polars_grouper_spark.operators.itemsets import frequent_triples


def test_benford_digit_extraction_and_shares(spark):
    # 1, 10, 100 -> digit 1; 9, 95 -> digit 9; 0 and negatives dropped
    vals = [1, 10, 100, 9, 95, 0, -7, 23]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert rows[1]["cnt"] == 3 and rows[9]["cnt"] == 2 and rows[2]["cnt"] == 1
    n = 6
    assert rows[1]["obs_share"] == 3 / n
    assert rows[1]["exp_share"] == math.log10(2)
    e = math.log10(2)
    o = 3 / n
    assert rows[1]["contrib"] == (o - e) * (o - e) / e


def test_benford_powers_of_ten_bucket_as_one(spark):
    # the libm-log trap inputs: exact powers of ten must all be digit 1
    df = spark.createDataFrame(
        [(10**k,) for k in range(0, 15)], "v long"
    )
    rows = benford_audit(df, "v").collect()
    assert len(rows) == 1 and rows[0]["digit"] == 1 and rows[0]["cnt"] == 15


def _brute_triples(baskets, min_support):
    per_tx = {}
    for tx, it in baskets:
        per_tx.setdefault(tx, set()).add(it)
    counts = Counter()
    for items in per_tx.values():
        for tri in itertools.combinations(sorted(items), 3):
            counts[tri] += 1
    return {t: c for t, c in counts.items() if c >= min_support}


def test_frequent_triples_matches_brute_force(spark):
    baskets = []
    for tx in range(60):
        items = {f"i{(tx * 7 + j * 3) % 11}" for j in range(5)}
        if tx % 2 == 0:
            items |= {"hot1", "hot2", "hot3"}
        baskets += [(tx, it) for it in items]
    df = spark.createDataFrame(baskets, "tx long, it string")
    for sup in (2, 10, 30):
        got = {
            (r["item_a"], r["item_b"], r["item_c"]): r["support"]
            for r in frequent_triples(df, "tx", "it", sup).collect()
        }
        assert got == _brute_triples(baskets, sup)


def test_frequent_triples_duplicate_rows_count_once(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"), (1, "c")] * 3
    df = spark.createDataFrame(rows, "tx long, it string")
    got = frequent_triples(df, "tx", "it", 1).collect()
    assert len(got) == 1 and got[0]["support"] == 1
