"""Property-based tests: random small graphs vs exact in-memory oracles.

Each Spark action costs ~0.5-2s locally, so example counts are kept small;
the value is in the randomized structure (cycles, self-loops, duplicate
edges, disconnected nodes), not volume.
"""

import heapq

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

pytestmark = pytest.mark.slow

from polars_grouper_spark import calculate_shortest_path, graph_solver, page_rank_nodes

NODE = st.integers(min_value=0, max_value=9)
EDGES = st.lists(st.tuples(NODE, NODE), min_size=1, max_size=14)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, edges):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in edges], schema="`from` string, `to` string"
    ).coalesce(1)


def _uf_groups(edges):
    """Reference-faithful union-find with first-appearance numbering."""
    ids = {}
    for a, b in edges:
        for x in (str(a), str(b)):
            if x not in ids:
                ids[x] = len(ids)
    parent = list(range(len(ids)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(ids[str(a)]), find(ids[str(b)])
        if ra != rb:
            parent[rb] = ra
    group_of_root = {}
    groups = {}
    counter = 1
    for node, nid in ids.items():
        root = find(nid)
        if root not in group_of_root:
            group_of_root[root] = counter
            counter += 1
        groups[node] = group_of_root[root]
    return groups


@_SETTINGS
@given(EDGES)
def test_graph_solver_matches_union_find(spark, edges):
    expected = _uf_groups(edges)
    got = {
        r["from"]: r["group"]
        for r in graph_solver(_df(spark, edges)).select("from", "group").collect()
    }
    for a, _ in edges:
        assert got[str(a)] == expected[str(a)], (edges, got, expected)


@_SETTINGS
@given(
    st.lists(
        st.tuples(NODE, NODE, st.integers(min_value=1, max_value=9)),
        min_size=1,
        max_size=10,
    ),
    st.booleans(),
)
def test_shortest_path_matches_dijkstra(spark, wedges, directed):
    df = spark.createDataFrame(
        [(str(a), str(b), float(w)) for a, b, w in wedges],
        schema="`from` string, `to` string, weight double",
    ).coalesce(1)
    got = {
        (r["from"], r["to"]): r["distance"]
        for r in calculate_shortest_path(df, directed=directed).collect()
    }

    adj = {}
    for a, b, w in wedges:
        q = int(float(w) * 1000)
        adj.setdefault(str(a), []).append((str(b), q))
        if not directed:
            adj.setdefault(str(b), []).append((str(a), q))
    nodes = {str(a) for a, b, _ in wedges} | {str(b) for _, b, _ in wedges}

    def dij(s):
        dist = {s: 0}
        h = [(0, s)]
        while h:
            c, u = heapq.heappop(h)
            if c > dist.get(u, 1 << 60):
                continue
            for v, w in adj.get(u, []):
                if c + w < dist.get(v, 1 << 60):
                    dist[v] = c + w
                    heapq.heappush(h, (c + w, v))
        return dist

    expected = {}
    for s in nodes:
        d = dij(s)
        for t, q in d.items():
            if t == s:
                continue
            if directed:
                expected[(s, t)] = q / 1000.0
            elif s < t:
                expected[(s, t)] = q / 1000.0
    assert got == expected, (wedges, directed)


@_SETTINGS
@given(EDGES)
def test_pagerank_mass_conservation(spark, edges):
    """Σ ranks = 1 - leaked dangling mass ≤ 1, and all ranks ≥ (1-d)/n."""
    scores = {
        r["node"]: r["score"]
        for r in page_rank_nodes(_df(spark, edges), max_iterations=10).collect()
    }
    n = len(scores)
    assert all(s >= 0.15 / n - 1e-12 for s in scores.values())
    assert sum(scores.values()) <= 1.0 + 1e-9


@given(edges=EDGES, directed=st.booleans())
@_SETTINGS
def test_distributed_betweenness_matches_exact(spark, edges, directed):
    """Random multigraphs (cycles, self-loops, duplicate edges): the
    join-based distributed Brandes must equal the in-memory kernel."""
    import math

    from polars_grouper_spark import (
        betweenness_centrality,
        betweenness_centrality_distributed,
    )

    df = _df(spark, edges)
    exact = {
        r["node"]: r["centrality"]
        for r in betweenness_centrality(
            df, normalized=False, directed=directed
        ).collect()
    }
    dist = {
        r["node"]: r["centrality"]
        for r in betweenness_centrality_distributed(
            df, normalized=False, directed=directed
        ).collect()
    }
    assert exact.keys() == dist.keys()
    for k in exact:
        assert math.isclose(exact[k], dist[k], rel_tol=1e-9, abs_tol=1e-12), (
            k, exact[k], dist[k], edges)


@given(
    wedges=st.lists(
        st.tuples(NODE, NODE, st.floats(min_value=0.1, max_value=3.0)),
        min_size=1,
        max_size=12,
    ),
    cutoff=st.floats(min_value=0.5, max_value=4.0),
)
@_SETTINGS
def test_max_distance_equals_posthoc_filter(spark, wedges, cutoff):
    """max_distance pruning must equal filtering the full all-pairs result
    — mid-loop pruning never loses a within-cutoff pair (prefix property),
    including at quantization boundaries."""
    df = spark.createDataFrame(
        [(str(a), str(b), float(w)) for a, b, w in wedges],
        schema="`from` string, `to` string, weight double",
    ).coalesce(1)
    full = {
        (r["from"], r["to"]): r["distance"]
        for r in calculate_shortest_path(df, directed=False).collect()
    }
    cut = {
        (r["from"], r["to"]): r["distance"]
        for r in calculate_shortest_path(
            df, directed=False, max_distance=cutoff
        ).collect()
    }
    q = int(cutoff * 1000.0) / 1000.0
    assert cut == {k: v for k, v in full.items() if v <= q}


# ---------------------------------------------------------------------------
# round-3/4 operators vs their exactly-replayable DuckDB oracles
# (VERDICT r3 task #5: the _sql builders ARE the spec — fuzz against them)
# ---------------------------------------------------------------------------

def _vals_sql(edges):
    return "SELECT * FROM (VALUES {}) t(src, dst)".format(
        ",".join(f"('{a}','{b}')" for a, b in edges)
    )


def _r9(row):
    return tuple(round(v, 9) if isinstance(v, float) else v for v in row)


@_SETTINGS
@given(EDGES)
def test_scc_matches_transitive_closure_oracle(spark, edges):
    import duckdb

    from polars_grouper_spark.operators.scc import (
        strongly_connected_components,
        strongly_connected_components_sql,
    )

    e = [(str(a), str(b)) for a, b in edges if a != b]
    if not e:
        return
    df = spark.createDataFrame(e, ["from", "to"])
    got = sorted(tuple(r) for r in strongly_connected_components(df).collect())
    want = sorted(duckdb.sql(strongly_connected_components_sql(_vals_sql(e))).fetchall())
    assert got == want, (edges,)


@_SETTINGS
@given(EDGES, st.integers(min_value=1, max_value=4))
def test_k_core_matches_unrolled_peel_oracle(spark, edges, k):
    import duckdb

    from polars_grouper_spark.operators.kcore import k_core, k_core_sql

    e = [(str(a), str(b)) for a, b in edges if a != b]
    if not e:
        return
    df = spark.createDataFrame(e, ["from", "to"])
    got = sorted(tuple(r) for r in k_core(df, k).collect())
    want = sorted(duckdb.sql(k_core_sql(_vals_sql(e), k, rounds=12)).fetchall())
    assert got == want, (edges, k)


@_SETTINGS
@given(EDGES, st.integers(min_value=3, max_value=4))
def test_k_truss_matches_unrolled_peel_oracle(spark, edges, k):
    import duckdb

    from polars_grouper_spark.operators.ktruss import k_truss, k_truss_sql

    e = [(str(a), str(b)) for a, b in edges if a != b]
    if not e:
        return
    df = spark.createDataFrame(e, ["from", "to"])
    got = sorted(tuple(r) for r in k_truss(df, k).collect())
    want = sorted(duckdb.sql(k_truss_sql(_vals_sql(e), k, rounds=12)).fetchall())
    assert got == want, (edges, k)


@_SETTINGS
@given(EDGES, st.sampled_from([None, 3]))
def test_link_scores_matches_wedge_oracle(spark, edges, cap):
    import duckdb

    from polars_grouper_spark.operators.link_prediction import (
        link_scores,
        link_scores_sql,
    )

    e = [(str(a), str(b)) for a, b in edges if a != b]
    if not e:
        return
    df = spark.createDataFrame(e, ["from", "to"])
    got = sorted(
        _r9(tuple(r)) for r in link_scores(df, max_center_degree=cap).collect()
    )
    want = sorted(
        _r9(t)
        for t in duckdb.sql(
            link_scores_sql(_vals_sql(e), max_center_degree=cap)
        ).fetchall()
    )
    assert got == want, (edges, cap)


@_SETTINGS
@given(
    st.lists(
        st.tuples(NODE, NODE, st.integers(min_value=0, max_value=20)),
        min_size=1,
        max_size=12,
    ),
    st.sets(NODE, min_size=1, max_size=3),
    st.integers(min_value=1, max_value=5),
)
def test_temporal_reachability_matches_oracle(spark, tedges, seeds, hops):
    import datetime as dt

    import duckdb

    from polars_grouper_spark.operators.temporal import (
        temporal_reachability,
        temporal_reachability_sql,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [(str(a), str(b), base + dt.timedelta(hours=h)) for a, b, h in tedges]
    srcs = sorted(str(s) for s in seeds)
    df = spark.createDataFrame(rows, "src string, dst string, ts timestamp")
    got = sorted(
        (r["node"], r["earliest_arrival"])
        for r in temporal_reachability(
            df, srcs, "src", "dst", "ts", max_hops=hops
        ).collect()
    )
    vals = ",".join(f"('{a}','{b}',TIMESTAMP '{t}')" for a, b, t in rows)
    want = sorted(
        duckdb.sql(
            temporal_reachability_sql(
                f"SELECT * FROM (VALUES {vals}) t(src, dst, ts)", srcs, hops
            )
        ).fetchall()
    )
    assert got == want, (tedges, srcs, hops)


_WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "x", "yy"]),
    min_size=0,
    max_size=30,
)


@_SETTINGS
@given(
    st.lists(_WORDS, min_size=1, max_size=6),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=0, max_value=7),
)
def test_chunking_matches_oracle(spark, docs, chunk_tokens, overlap):
    import duckdb

    from polars_grouper_spark.functions.chunking import (
        chunk_documents,
        chunk_documents_sql,
    )

    if overlap >= chunk_tokens:
        overlap = chunk_tokens - 1
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        tuple(r)
        for r in chunk_documents(
            df, chunk_tokens=chunk_tokens, overlap=overlap
        ).collect()
    )
    vals = ",".join("({}, '{}')".format(i, t) for i, t in rows)
    sql = chunk_documents_sql(
        f"(SELECT * FROM (VALUES {vals}) v(doc_id, text))",
        chunk_tokens=chunk_tokens,
        overlap=overlap,
    )
    want = sorted(duckdb.sql(sql).fetchall())
    assert got == want, (docs, chunk_tokens, overlap)


@_SETTINGS
@given(st.lists(_WORDS, min_size=1, max_size=8), st.integers(min_value=1, max_value=40))
def test_packing_matches_oracle(spark, docs, budget):
    import duckdb

    from polars_grouper_spark.functions.chunking import (
        pack_sequences,
        pack_sequences_sql,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(tuple(r) for r in pack_sequences(df, budget=budget).collect())
    vals = ",".join("({}, '{}')".format(i, t) for i, t in rows)
    sql = pack_sequences_sql(
        f"(SELECT * FROM (VALUES {vals}) v(doc_id, text))", budget=budget
    )
    want = sorted(duckdb.sql(sql).fetchall())
    assert got == want, (docs, budget)


@given(edges=EDGES)
@_SETTINGS
def test_mis_independence_and_maximality(spark, edges):
    """Luby MIS invariants on random graphs (VERDICT r4 #7): the chosen
    set must be INDEPENDENT (no edge inside it) and MAXIMAL (every
    excluded node has a chosen neighbor) — together these define an MIS
    regardless of which one the hash priorities pick."""
    from polars_grouper_spark.operators.mis import maximal_independent_set

    out = maximal_independent_set(_df(spark, edges)).collect()
    in_mis = {r["node"] for r in out if r["in_mis"]}
    nodes = {r["node"] for r in out}
    # cleaned-graph semantics: self-loops drop, endpoints stringify
    adj = {}
    for a, b in edges:
        a, b = str(a), str(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert nodes == set(adj), "every non-isolated node gets a row"
    for a, ns in adj.items():
        if a in in_mis:
            assert not (ns & in_mis), f"edge inside MIS at {a}"
        else:
            assert ns & in_mis, f"{a} excluded but has no chosen neighbor"


@given(edges=EDGES)
@_SETTINGS
def test_densest_peeling_invariants(spark, edges):
    """Densest-subgraph peeling invariants: round 0 states the cleaned
    graph exactly; node/edge counts strictly shrink per round to empty;
    the reported best density is >= half the true maximum density over
    ALL subgraphs (the 2(1+eps) guarantee with eps=0.1), which we verify
    against brute force over node subsets (graphs here have <= 10
    nodes... capped to exhaustive only when small)."""
    from itertools import combinations

    from polars_grouper_spark.operators.densest import densest_subgraph_rounds

    simple = {tuple(sorted((str(a), str(b)))) for a, b in edges if str(a) != str(b)}
    if not simple:
        return
    rows = densest_subgraph_rounds(_df(spark, edges)).orderBy("round").collect()
    assert rows[0]["n_nodes"] == len({x for e in simple for x in e})
    assert rows[0]["n_edges"] == len(simple)
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_nodes"] < prev["n_nodes"], "peeling must shrink"
        assert cur["n_edges"] <= prev["n_edges"]
    best = max(r["density"] for r in rows)
    nodes = sorted({x for e in simple for x in e})
    if len(nodes) <= 8:  # exhaustive ground truth
        true_best = 0.0
        for r in range(1, len(nodes) + 1):
            for sub in combinations(nodes, r):
                ss = set(sub)
                m = sum(1 for a, b in simple if a in ss and b in ss)
                true_best = max(true_best, m / len(ss))
        assert best >= true_best / (2 * 1.1) - 1e-9, (
            f"approximation guarantee broken: best={best}, true={true_best}"
        )
        # best is display-ROUNDED to 6 decimals, so allow half a rounding ulp
        assert best <= true_best + 5e-7, "reported density can't beat optimum"


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=4), min_size=1, max_size=12
    )
)
@_SETTINGS
def test_fuzzy_ed1_no_false_negatives(spark, words):
    """SymSpell deletion-neighborhood join vs brute-force Levenshtein:
    every distinct pair at edit distance <= 1 must be found (no false
    negatives — the SymSpell completeness theorem for ed<=1), and
    nothing at distance > 1 may appear."""
    from polars_grouper_spark.functions.fuzzy import fuzzy_join_ed1

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    uniq = sorted(set(words))
    want = {
        (a, b)
        for i, a in enumerate(uniq)
        for b in uniq[i + 1 :]
        if lev(a, b) <= 1
    }
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        (r["val_a"], r["val_b"])
        for r in fuzzy_join_ed1(df, df, "w", "w").collect()
    }
    assert got == want


@given(
    wedges=st.lists(
        st.tuples(NODE, NODE, st.sampled_from([0.25, 0.5, 0.75, 1.0, 1.5, 2.0])),
        min_size=1,
        max_size=16,
    )
)
@_SETTINGS
def test_boruvka_msf_matches_kruskal(spark, wedges):
    """Borůvka rounds vs an in-memory Kruskal under the same total edge
    order (wq, a, b) — with a total order the MSF is unique, so the two
    algorithms must agree edge-for-edge on any random multigraph."""
    from polars_grouper_spark.operators.mst import minimum_spanning_forest

    canon = {}
    for a, b, w in wedges:
        a, b = str(a), str(b)
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        canon[k] = min(canon.get(k, 1 << 40), int(w * 1000))
    edges = [(a, b, w) for (a, b), w in canon.items()]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    want = []
    for wq, a, b in sorted((w, a, b) for a, b, w in edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            want.append((a, b, wq))

    df = spark.createDataFrame(
        [(str(a), str(b), w) for a, b, w in wedges],
        "src string, dst string, weight double",
    )
    got = sorted(
        (r["edge_a"], r["edge_b"], int(r["weight"] * 1000))
        for r in minimum_spanning_forest(df, "src", "dst", "weight").collect()
    )
    assert got == sorted(want)


@given(edges=EDGES)
@_SETTINGS
def test_greedy_coloring_proper_and_bounded(spark, edges):
    """Coloring invariants on random graphs: every node colored, no
    monochromatic edge, palette <= max-degree + 1 (guaranteed by MIS
    maximality: a node uncolored after class c had a neighbor in each
    of the first c classes)."""
    from polars_grouper_spark.operators.coloring import greedy_coloring

    simple = {tuple(sorted((str(a), str(b)))) for a, b in edges if str(a) != str(b)}
    if not simple:
        return
    got = {
        r["node"]: r["color"]
        for r in greedy_coloring(_df(spark, edges)).collect()
    }
    deg = {}
    for a, b in simple:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert set(got) == set(deg), "every edge-list node must be colored"
    for a, b in simple:
        assert got[a] != got[b], f"monochromatic edge {a}-{b}"
    assert max(got.values()) <= max(deg.values()) + 1


@given(
    base=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 99)), max_size=10
    ),
    changes=st.lists(
        st.tuples(
            st.integers(0, 12),
            st.integers(0, 99),
            st.sampled_from(["upsert", "delete"]),
        ),
        max_size=8,
        unique_by=lambda t: t[0],  # valid batch: unique keys
    ),
)
@_SETTINGS
def test_merge_upsert_matches_dict_replay(spark, base, changes):
    """MERGE semantics vs an in-memory dict replay on random
    base/change sets (last-base-row-wins dedup of the base mirrors a
    keyed table)."""
    from polars_grouper_spark.operators.upsert import merge_upsert

    table = {}
    for k, v in base:
        table[k] = v
    for k, v, op in changes:
        if op == "delete":
            table.pop(k, None)
        else:
            table[k] = v
    # base as a keyed table: one row per key (last value wins)
    base_rows = list({k: v for k, v in base}.items())
    if not base_rows:
        base_rows = [(999999, 0)]  # schema anchor; key unlikely to collide
        table.setdefault(999999, 0)
        if any(k == 999999 and op == "delete" for k, _, op in changes):
            table.pop(999999, None)
    bdf = spark.createDataFrame(base_rows, "k long, v long")
    if changes:
        cdf = spark.createDataFrame(
            [(k, v, op) for k, v, op in changes], "k long, v long, op string"
        )
        out = merge_upsert(bdf, cdf, ["k"])
    else:
        out = bdf
    got = sorted((r["k"], r["v"]) for r in out.collect())
    assert got == sorted(table.items())


@given(
    ivals=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 30)),
        min_size=1,
        max_size=12,
    )
)
@_SETTINGS
def test_interval_coverage_matches_bruteforce_union(spark, ivals):
    """Union length vs brute-force point enumeration (closed intervals
    contribute their half-open [s, e) measure; points add zero)."""
    from polars_grouper_spark.operators.intervals import interval_coverage

    rows = [("g", s, s + d) for s, d in ivals]
    covered_points = set()
    for _, s, e in rows:
        covered_points.update(range(s, e))
    df = spark.createDataFrame(rows, "grp string, s long, e long")
    r = interval_coverage(df, "s", "e", "grp").collect()[0]
    assert r["covered"] == len(covered_points)
    assert r["n_intervals"] == len(rows)


@given(
    snaps=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 30), st.integers(0, 2)),
        min_size=1,
        max_size=16,
        unique_by=lambda t: (t[0], t[1]),  # one row per (key, version)
    )
)
@_SETTINGS
def test_scd2_history_matches_run_scan(spark, snaps):
    """Gaps-and-islands SCD2 vs an in-memory run scan over each key's
    version-ordered attribute sequence."""
    from polars_grouper_spark.operators.snapshot_diff import scd2_history

    per_key = {}
    for k, v, a in snaps:
        per_key.setdefault(k, []).append((v, a))
    want = []
    for k, seq in per_key.items():
        seq.sort()
        run_start, run_attr, n = None, None, 0
        prev_v = None
        for v, a in seq:
            if run_start is None or a != run_attr:
                if run_start is not None:
                    want.append((str(k), run_attr, run_start, prev_v, n))
                run_start, run_attr, n = v, a, 0
            n += 1
            prev_v = v
        want.append((str(k), run_attr, run_start, prev_v, n))
    df = spark.createDataFrame(
        [(str(k), v, a) for k, v, a in snaps], "key string, v long, attr long"
    )
    got = sorted(
        (r["key"], r["attr"], r["valid_from"], r["valid_to"], r["n_versions"])
        for r in scd2_history(df, ["key"], ["attr"], "v").collect()
    )
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# round-5 batch 2: LPA, rolling actives, EWMA, FastRP
# ---------------------------------------------------------------------------


def _lpa_brute(edges, rounds):
    """Synchronous LPA with (count desc, label asc) tie-break."""
    adj = {}
    for a, b in edges:
        a, b = str(a), str(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n in adj:
            votes = {}
            for m in adj[n]:
                votes[labels[m]] = votes.get(labels[m], 0) + 1
            nxt[n] = min(votes, key=lambda l: (-votes[l], l))
        labels = nxt
    return labels


@given(edges=EDGES, rounds=st.integers(min_value=0, max_value=3))
@_SETTINGS
def test_lpa_matches_brute_force(spark, edges, rounds):
    from polars_grouper_spark.operators.communities import lpa_communities

    df = _df(spark, edges)
    got = {
        r["node"]: r["community"]
        for r in lpa_communities(df, "from", "to", rounds=rounds).collect()
    }
    assert got == _lpa_brute(edges, rounds)


@given(
    acts=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 20)), min_size=1, max_size=25
    ),
    window=st.integers(min_value=1, max_value=8),
)
@_SETTINGS
def test_rolling_active_matches_brute_force(spark, acts, window):
    from polars_grouper_spark.operators.intervals import rolling_active_count

    df = spark.createDataFrame(acts, "key int, tick int").coalesce(1)
    got = {
        r["tick"]: (r["active_now"], r["active_window"])
        for r in rolling_active_count(df, "key", "tick", window).collect()
    }
    da = set(acts)
    ticks = sorted({t for _, t in da})
    want = {}
    for d in ticks:
        now = {k for k, t in da if t == d}
        win = {k for k, t in da if d - window + 1 <= t <= d}
        want[d] = (len(now), len(win))
    assert got == want


@given(
    vals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=1,
        max_size=15,
    ),
    alpha=st.floats(min_value=0.1, max_value=0.9),
    lookback=st.integers(min_value=1, max_value=6),
)
@_SETTINGS
def test_ewma_matches_brute_force(spark, vals, alpha, lookback):
    import pytest as _pytest

    from polars_grouper_spark.functions.timeseries import ewma

    rows = [("k", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, t int, v double").coalesce(1)
    got = {
        r["t"]: r["ewma"]
        for r in ewma(
            df, "key", ["t"], "v", alpha=alpha, lookback=lookback, round_to=9
        ).collect()
    }
    for i in range(len(vals)):
        frame = vals[max(0, i - lookback + 1) : i + 1]
        num = 0.0
        for x in frame:
            num = num * alpha + x
        den = (1.0 - alpha ** len(frame)) / (1.0 - alpha)
        assert got[i] == _pytest.approx(num / den, abs=1e-6), i


@given(edges=EDGES)
@_SETTINGS
def test_tier_equality_mis_scc_matching(spark, edges):
    """Round-7 two-tier invariant on randomized structure (cycles,
    self-loops, duplicates): driver-local mirror == distributed loop
    for the hash-priority and partition-pure operator families."""
    from polars_grouper_spark.operators.matching import greedy_matching
    from polars_grouper_spark.operators.mis import maximal_independent_set
    from polars_grouper_spark.operators.scc import (
        strongly_connected_components,
    )

    df = _df(spark, edges)
    clean = [(str(a), str(b)) for a, b in edges if a != b]
    for op in (
        maximal_independent_set,
        greedy_matching,
        strongly_connected_components,
    ):
        if not clean and op is strongly_connected_components:
            continue  # empty cleaned graph: both tiers return empty
        loc = sorted(tuple(r) for r in op(df).collect())
        dist = sorted(
            tuple(r) for r in op(df, max_local_edges=0).collect()
        )
        assert loc == dist, f"tier divergence in {op.__name__}"


@given(
    edges=st.lists(
        st.tuples(NODE, NODE, st.integers(min_value=0, max_value=9)),
        min_size=1,
        max_size=12,
    )
)
@_SETTINGS
def test_tier_equality_mst_and_sp(spark, edges):
    from polars_grouper_spark.operators.mst import minimum_spanning_forest
    from polars_grouper_spark.operators.shortest_path import (
        calculate_shortest_path as csp,
    )

    df = spark.createDataFrame(
        [(str(a), str(b), w / 2.0) for a, b, w in edges],
        schema="`from` string, `to` string, weight double",
    ).coalesce(1)
    for op, kwargs in ((minimum_spanning_forest, {}), (csp, {})):
        loc = sorted(tuple(r) for r in op(df, **kwargs).collect())
        dist = sorted(
            tuple(r) for r in op(df, max_local_edges=0, **kwargs).collect()
        )
        assert loc == dist, f"tier divergence in {op.__name__}"


@given(
    wedges=st.lists(
        st.tuples(NODE, NODE, st.sampled_from([0.5, 1.0, 1.5, 2.5])),
        min_size=1,
        max_size=12,
    ),
    cutoff=st.sampled_from([1.0, 2.0, 3.5]),
    directed=st.booleans(),
)
@_SETTINGS
def test_tier_equality_sp_dial_and_bfs(spark, wedges, cutoff, directed):
    """All four shortest-path execution tiers must agree row-for-row:
    distributed relaxation, scalar Dijkstra, the vectorized Dial kernel
    (forced by starving max_local_work with a cutoff set), and — when
    weights are uniform — the vectorized CSR BFS.  Quantized integer
    distances are unique minima, so any divergence is a tier bug."""
    from polars_grouper_spark.operators.shortest_path import (
        calculate_shortest_path as csp,
    )

    df = spark.createDataFrame(
        [(str(a), str(b), float(w)) for a, b, w in wedges],
        schema="`from` string, `to` string, weight double",
    ).coalesce(1)
    kw = dict(directed=directed, max_distance=cutoff)
    dist = sorted(
        tuple(r) for r in csp(df, max_local_edges=0, **kw).collect()
    )
    scalar = sorted(tuple(r) for r in csp(df, **kw).collect())
    dial = sorted(
        tuple(r)
        for r in csp(df, max_local_work=0, max_local_bfs_work=10**9, **kw).collect()
    )
    assert scalar == dist, "scalar Dijkstra tier diverged"
    assert dial == dist, "vectorized Dial tier diverged"

    # Uniform weights additionally route through the CSR BFS tier.
    dfu = spark.createDataFrame(
        [(str(a), str(b), 1.0) for a, b, _ in wedges],
        schema="`from` string, `to` string, weight double",
    ).coalesce(1)
    bfs = sorted(tuple(r) for r in csp(dfu, **kw).collect())
    distu = sorted(
        tuple(r) for r in csp(dfu, max_local_edges=0, **kw).collect()
    )
    assert bfs == distu, "CSR BFS tier diverged"


@given(edges=EDGES, directed=st.booleans(), rounds=st.sampled_from([1, 3]))
@_SETTINGS
def test_tier_equality_lpa(spark, edges, directed, rounds):
    """Synchronous LPA's local numpy tier must equal the distributed
    loop on random graphs — including the directed drop-out quirk
    (a node with no in-edges leaves the label state after round 1)."""
    from polars_grouper_spark.operators.communities import lpa_communities

    df = _df(spark, edges)
    loc = sorted(
        tuple(r)
        for r in lpa_communities(df, rounds=rounds, directed=directed).collect()
    )
    dist = sorted(
        tuple(r)
        for r in lpa_communities(
            df, rounds=rounds, directed=directed, max_local_edges=0
        ).collect()
    )
    assert loc == dist


@given(edges=EDGES, directed=st.booleans(), radius=st.sampled_from([0, 1, 2]))
@_SETTINGS
def test_tier_equality_hll_ball(spark, edges, directed, radius):
    """The HLL ball local tier (dense numpy scatter-max) must equal the
    distributed hop-merge loop — register state is an integer max-merge,
    so any divergence is a kernel bug, not float noise."""
    from polars_grouper_spark.operators.neighborhood import hll_ball_size

    df = _df(spark, edges)
    loc = sorted(
        tuple(r)
        for r in hll_ball_size(df, radius=radius, b=6, directed=directed).collect()
    )
    dist = sorted(
        tuple(r)
        for r in hll_ball_size(
            df, radius=radius, b=6, directed=directed, max_local_edges=0
        ).collect()
    )
    assert loc == dist


@given(edges=EDGES, k=st.sampled_from([1, 2, 3]))
@_SETTINGS
def test_tier_equality_kcore(spark, edges, k):
    """The k-core is the unique maximal subgraph with min degree >= k,
    so the local numpy peel and the distributed semi-join peel must
    agree exactly (nodes AND within-core degrees)."""
    from polars_grouper_spark.operators.kcore import k_core

    df = _df(spark, edges)
    loc = sorted(tuple(r) for r in k_core(df, k).collect())
    dist = sorted(
        tuple(r) for r in k_core(df, k, max_local_edges=0).collect()
    )
    assert loc == dist


@given(edges=EDGES, iters=st.sampled_from([1, 3]))
@_SETTINGS
def test_tier_equality_hits(spark, edges, iters):
    """HITS integer recursion: int64 scatter-sum local tier must equal
    the distributed decimal-guarded loop on random graphs (raw scores
    AND the round-9 max-normalized columns)."""
    from polars_grouper_spark.operators.hits import hits

    df = _df(spark, edges)
    loc = sorted(tuple(r) for r in hits(df, iters=iters).collect())
    dist = sorted(
        tuple(r) for r in hits(df, iters=iters, max_local_edges=0).collect()
    )
    assert loc == dist


@given(edges=EDGES, k=st.sampled_from([2, 3, 4]))
@_SETTINGS
def test_tier_equality_ktruss(spark, edges, k):
    """The k-truss is the unique maximal subgraph with edge support
    >= k-2, so the local CSR wedge peel and the distributed
    support-peel loop must agree exactly (edges AND supports)."""
    from polars_grouper_spark.operators.ktruss import k_truss

    df = _df(spark, edges)
    loc = sorted(tuple(r) for r in k_truss(df, k).collect())
    dist = sorted(
        tuple(r) for r in k_truss(df, k, max_local_edges=0).collect()
    )
    assert loc == dist


ROWS = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C", "D"]),
        st.integers(min_value=1, max_value=500),
    ),
    min_size=1,
    max_size=25,
)
TARGETS = st.dictionaries(
    st.sampled_from(["A", "B", "C"]),
    st.floats(min_value=0.05, max_value=1.0, allow_nan=False),
    min_size=1,
    max_size=3,
)


@given(rows=ROWS, targets=TARGETS)
@_SETTINGS
def test_mixture_waterfill_invariants(spark, rows, targets):
    """For ANY data/targets: only groups present in both data and targets
    appear; kept never exceeds available; the binding group keeps rate
    1.0 and passes whole; planned weights realize the target proportions
    exactly (planned_g / S == share_g by construction)."""
    from polars_grouper_spark.functions.sampling import mixture_waterfill

    df = spark.createDataFrame(
        [(f"id{i}", g, w) for i, (g, w) in enumerate(rows)],
        "doc_id string, grp string, w long",
    ).coalesce(1)
    out = mixture_waterfill(df, targets, "grp", "w", "doc_id").collect()
    present = {g for g, _ in rows}
    assert {r["grp"] for r in out} == present & set(targets)
    if not out:
        return
    norm = sum(targets.values())
    s_cap = min(r["available_w"] / (targets[r["grp"]] / norm) for r in out)
    for r in out:
        share = targets[r["grp"]] / norm
        assert r["kept_w"] <= r["available_w"]
        assert r["kept_rows"] >= 0
        assert 0.0 <= r["rate"] <= 1.0
        assert abs(r["planned_w"] - s_cap * share) <= 0.002
        if r["rate"] == 1.0:
            # a rate-1 group passes through whole
            assert r["kept_w"] == r["available_w"]
    # the binding group exists and keeps everything
    assert any(r["rate"] == 1.0 for r in out)
