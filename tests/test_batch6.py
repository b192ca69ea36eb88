"""Round-5 batch 6: greedy matching, skyline, Mann-Whitney / Spearman,
target encoding — invariants and brute-force cross-checks."""

from __future__ import annotations

import itertools
import math
import random

import pytest
from pyspark.sql import functions as F

from polars_grouper_spark.functions.experiment import (
    mann_whitney_u,
    spearman_corr,
)
from polars_grouper_spark.functions.features import target_encode
from polars_grouper_spark.operators.matching import greedy_matching
from polars_grouper_spark.operators.skyline import skyline_2d


# ---------------------------------------------------------------- matching
def _random_edges(rng, n_nodes, n_edges):
    out = set()
    while len(out) < n_edges:
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a != b:
            out.add((min(a, b), max(a, b)))
    return [(f"n{a}", f"n{b}") for a, b in out]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_matching_is_valid_and_maximal(spark, seed):
    rng = random.Random(seed)
    edges = _random_edges(rng, 40, 120)
    df = spark.createDataFrame(edges, ["from", "to"])
    m = greedy_matching(df, max_rounds=40).collect()
    pairs = [(r.a, r.b) for r in m]
    used = [n for p in pairs for n in p]
    # a matching: no node appears twice
    assert len(used) == len(set(used))
    # maximal: every input edge touches a matched node
    matched = set(used)
    for a, b in edges:
        assert a in matched or b in matched, (a, b)
    # matched pairs are actual edges
    edge_set = {(min(a, b), max(a, b)) for a, b in edges}
    for a, b in pairs:
        assert (min(a, b), max(a, b)) in edge_set


def test_matching_drops_self_loops_and_dupes(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b"), (None, "c")],
        ["from", "to"],
    )
    m = greedy_matching(df).collect()
    assert [(r.a, r.b) for r in m] == [("a", "b")]


def test_matching_raises_without_convergence(spark):
    df = spark.createDataFrame([("a", "b"), ("b", "c")], ["from", "to"])
    with pytest.raises(RuntimeError, match="max_rounds"):
        greedy_matching(df, max_rounds=0)


# ----------------------------------------------------------------- skyline
def _brute_skyline(points):
    # per-x max-y reduction, then NOT EXISTS strict dominance
    best = {}
    for x, y in points:
        if x not in best or y > best[x]:
            best[x] = y
    pts = list(best.items())
    out = []
    for x, y in pts:
        if not any(qx > x and qy >= y for qx, qy in pts):
            out.append((x, y))
    return sorted(out)


@pytest.mark.parametrize("seed,n", [(1, 50), (2, 500), (3, 200)])
def test_skyline_matches_bruteforce(spark, seed, n):
    rng = random.Random(seed)
    pts = [
        (round(rng.uniform(0, 100), 2), round(rng.uniform(0, 100), 2))
        for _ in range(n)
    ]
    # correlated + anti-correlated stripes to stress bucket pruning
    pts += [(float(i), float(100 - i)) for i in range(40)]
    df = spark.createDataFrame(pts, ["x", "y"])
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y", n_buckets=8).collect())
    assert got == _brute_skyline(pts)


def test_skyline_candidate_cap_raises(spark):
    pts = [(float(i), float(100 - i)) for i in range(50)]  # all on frontier
    df = spark.createDataFrame(pts, ["x", "y"])
    with pytest.raises(RuntimeError, match="max_candidates"):
        skyline_2d(df, "x", "y", max_candidates=10)


def test_skyline_single_value_and_ties(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (1.0, 7.0), (1.0, 6.0)], ["x", "y"]
    )
    assert [(r.x, r.y) for r in skyline_2d(df, "x", "y").collect()] == [(1.0, 7.0)]


# ---------------------------------------------------- Mann-Whitney / Spearman
def _brute_u_and_z(a_vals, b_vals):
    u = sum(
        1.0 if a > b else (0.5 if a == b else 0.0)
        for a in a_vals
        for b in b_vals
    )
    na, nb = len(a_vals), len(b_vals)
    n = na + nb
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(a_vals + b_vals).values())
    mu = na * nb / 2.0
    sig = math.sqrt((na * nb / 12.0) * ((n + 1.0) - ties / (n * (n - 1.0))))
    return u, (u - mu) / sig


@pytest.mark.parametrize("seed", [1, 2])
def test_mann_whitney_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    rows = [("A", float(rng.randint(0, 20))) for _ in range(80)] + [
        ("B", float(rng.randint(5, 25))) for _ in range(60)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = mann_whitney_u(df, "g", "v", "A", "B").collect()[0]
    u, z = _brute_u_and_z(
        [v for g, v in rows if g == "A"], [v for g, v in rows if g == "B"]
    )
    assert r.n_a == 80 and r.n_b == 60
    assert r.u_a == pytest.approx(u, abs=1e-9)
    assert r.z == pytest.approx(z, rel=1e-12)


def _avg_ranks(vals):
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and vals[order[j]] == vals[order[i]]:
            j += 1
        avg = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[order[k]] = avg
        i = j
    return ranks


@pytest.mark.parametrize("seed", [1, 2])
def test_spearman_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    xs = [float(rng.randint(0, 15)) for _ in range(200)]
    ys = [x * 2 + rng.uniform(-5, 5) for x in xs]
    df = spark.createDataFrame(list(zip(xs, ys)), ["x", "y"])
    r = spearman_corr(df, "x", "y").collect()[0]
    rx, ry = _avg_ranks(xs), _avg_ranks(ys)
    n = len(xs)
    mean = lambda v: sum(v) / n  # noqa: E731
    mx, my = mean(rx), mean(ry)
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(sum((a - mx) ** 2 for a in rx)) * math.sqrt(
        sum((b - my) ** 2 for b in ry)
    )
    assert r.n == n
    assert r.rho == pytest.approx(num / den, rel=1e-9)
    assert 0.5 < r.rho <= 1.0  # strongly monotone by construction


def test_spearman_perfect_monotone(spark):
    df = spark.createDataFrame(
        [(float(i), float(i**3)) for i in range(1, 30)], ["x", "y"]
    )
    assert spearman_corr(df, "x", "y").collect()[0].rho == pytest.approx(1.0)


# ------------------------------------------------------------ target encode
def test_target_encode_matches_pandas(spark):
    rng = random.Random(7)
    rows = [
        (i, rng.choice(["a", "b", "c"]), round(rng.uniform(0, 100), 2))
        for i in range(200)
    ] + [(999, "solo", 42.0)]
    df = spark.createDataFrame(rows, ["id", "cat", "y"])
    got = {r.id: r for r in target_encode(df, "cat", "y", "id").collect()}
    m = 10.0
    prior = sum(y for _, _, y in rows) / len(rows)
    from collections import defaultdict

    s = defaultdict(float)
    n = defaultdict(int)
    for _, c, y in rows:
        s[c] += y
        n[c] += 1
    for i, c, y in rows:
        enc = (s[c] + m * prior) / (n[c] + m)
        loo = (s[c] - y + m * prior) / (n[c] - 1 + m)
        assert got[i].enc == pytest.approx(enc, rel=1e-9), (i, c)
        assert got[i].enc_loo == pytest.approx(loo, rel=1e-9), (i, c)
    # singleton LOO falls back to exactly the prior
    assert got[999].enc_loo == pytest.approx(prior, rel=1e-12)


def test_target_encode_drops_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, None, 2.0), (3, "a", None), (None, "a", 3.0)],
        "id int, cat string, y double",
    )
    assert target_encode(df, "cat", "y", "id").count() == 1


def test_mst_local_and_distributed_tiers_identical(spark):
    from polars_grouper_spark.operators.mst import minimum_spanning_forest

    edges = spark.createDataFrame(
        [
            (f"v{(3 * i) % 12}", f"v{(7 * i + 2) % 12}", (i % 5) + 0.5)
            for i in range(30)
        ],
        ["from", "to", "weight"],
    )
    loc = sorted(
        tuple(r) for r in minimum_spanning_forest(edges).collect()
    )
    dist = sorted(
        tuple(r)
        for r in minimum_spanning_forest(edges, max_local_edges=0).collect()
    )
    assert loc == dist


def test_matching_local_and_distributed_tiers_identical(spark):
    from polars_grouper_spark.operators.matching import greedy_matching

    edges = spark.createDataFrame(
        [(f"w{(5 * i) % 14}", f"w{(9 * i + 3) % 14}") for i in range(35)],
        ["from", "to"],
    )
    loc = sorted(tuple(r) for r in greedy_matching(edges).collect())
    dist = sorted(
        tuple(r) for r in greedy_matching(edges, max_local_edges=0).collect()
    )
    assert loc == dist
