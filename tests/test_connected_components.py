"""Ported reference golden tests for connected components.

Reference: /root/reference/tests/test_graph_solver.py:43-87 plus null
handling from :345-364 semantics (graph_solver sentinel 0).
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from polars_grouper_spark import (
    connected_components,
    graph_solver,
    super_merger,
    super_merger_weighted,
)


def _edges(spark, frm, to):
    return spark.createDataFrame(
        [Row(**{"from": f, "to": t}) for f, t in zip(frm, to)],
        schema="`from` string, `to` string",
    ).coalesce(1)


def test_graph_solver_golden(spark):
    df = _edges(
        spark,
        ["A", "B", "C", "E", "F", "G", "I", "I", "AA"],
        ["B", "C", "D", "F", "G", "J", "K", "J", "Z"],
    )
    result = [r.group for r in graph_solver(df).select("from", "group").orderBy("from").collect()]
    expected = dict(
        zip(
            ["A", "B", "C", "E", "F", "G", "I", "I", "AA"],
            [1, 1, 1, 2, 2, 2, 2, 2, 3],
        )
    )
    got = {
        r["from"]: r["group"]
        for r in graph_solver(df).select("from", "group").collect()
    }
    assert got == expected


def test_super_merger_golden(spark):
    df = _edges(spark, ["A", "B", "C", "E", "F", "G", "I"], ["B", "C", "D", "F", "G", "J", "K"])
    got = {(r["from"], r["to"]): r["group"] for r in super_merger(df).collect()}
    expected = {
        ("A", "B"): 1,
        ("B", "C"): 1,
        ("C", "D"): 1,
        ("E", "F"): 2,
        ("F", "G"): 2,
        ("G", "J"): 2,
        ("I", "K"): 3,
    }
    assert got == expected


def test_super_merger_empty(spark):
    df = spark.createDataFrame([], schema="`from` string, `to` string")
    out = super_merger(df)
    assert out.columns == ["from", "to", "group"]
    assert out.count() == 0


def test_super_merger_single_component(spark):
    df = _edges(spark, ["A", "B", "C"], ["B", "C", "A"])
    got = {r["from"]: r["group"] for r in super_merger(df).collect()}
    assert got == {"A": 1, "B": 1, "C": 1}


def test_super_merger_weighted(spark):
    df = spark.createDataFrame(
        [("A", "B", 1.0), ("B", "C", 0.05), ("D", "E", 0.5)],
        schema="`from` string, `to` string, weight double",
    ).coalesce(1)
    out = super_merger_weighted(df, "from", "to", "weight", 0.1)
    got = {(r["from"], r["to"]): r["group"] for r in out.collect()}
    # B-C edge filtered out; numbering on the filtered frame.
    assert got == {("A", "B"): 1, ("D", "E"): 2}


def test_graph_solver_null_sentinel(spark):
    df = spark.createDataFrame(
        [("A", "B"), ("X", None), ("C", "A")],
        schema="`from` string, `to` string",
    ).coalesce(1)
    got = {r["from"]: r["group"] for r in graph_solver(df).collect()}
    # X's only edge is dropped -> X never interned -> sentinel 0.
    assert got == {"A": 1, "X": 0, "C": 1}


def test_graph_solver_self_loop_isolated(spark):
    df = _edges(spark, ["A", "B"], ["A", "C"])
    got = {r["from"]: r["group"] for r in graph_solver(df).collect()}
    # Self-loop keeps A in its own component; numbering by first appearance.
    assert got == {"A": 1, "B": 2}


def test_connected_components_table(spark):
    df = _edges(spark, ["A", "B", "X"], ["B", "C", "Y"])
    rows = connected_components(df).orderBy("group", "node").collect()
    comp = {r["node"]: r["group"] for r in rows}
    assert comp == {"A": 1, "B": 1, "C": 1, "X": 2, "Y": 2}


def test_integer_node_ids_coerced(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], schema="`from` long, `to` long"
    ).coalesce(1)
    got = {r["from"]: r["group"] for r in graph_solver(df).collect()}
    assert got == {1: 1, 2: 1, 10: 2}


def test_skew_safe_paths_match_default(spark):
    """skew_safe=True swaps windowed mins for groupBy+join in the star
    loop and label recovery -- results must be identical."""
    from polars_grouper_spark import components

    df = _edges(
        spark,
        ["A", "B", "C", "hub", "hub", "hub", "hub", "X"],
        ["B", "C", "A", "u1", "u2", "u3", "u4", "Y"],
    )
    base = sorted((r["node"], r["component"]) for r in components(df).collect())
    safe = sorted(
        (r["node"], r["component"]) for r in components(df, skew_safe=True).collect()
    )
    assert base == safe

    num_base = sorted(
        (r["node"], r["group"]) for r in connected_components(df).collect()
    )
    num_safe = sorted(
        (r["node"], r["group"])
        for r in connected_components(df, skew_safe=True).collect()
    )
    assert num_base == num_safe


def test_incremental_components_equals_full_recompute(spark):
    """Adding edge batches through incremental_components must produce
    the identical canonical labeling as recomputing from scratch —
    including batches that MERGE previously separate components and
    batches introducing brand-new nodes."""
    from polars_grouper_spark.operators.connected_components import (
        components,
        incremental_components,
    )

    base_edges = [("a", "b"), ("c", "d"), ("e", "f"), ("x", "y")]
    batch1 = [("b", "c"), ("n1", "n2")]          # merge {a,b}+{c,d}; new comp
    batch2 = [("f", "x"), ("n2", "a"), ("z", "z")]  # chain merges; self-loop
    df = lambda rows: spark.createDataFrame(rows, "`from` string, `to` string")  # noqa: E731

    labels = components(df(base_edges))
    labels = incremental_components(labels, df(batch1))
    labels = incremental_components(labels, df(batch2))
    got = sorted(map(tuple, labels.collect()))

    full = components(df(base_edges + batch1 + batch2))
    want = sorted(map(tuple, full.collect()))
    assert got == want


def test_incremental_components_touches_component_graph_not_v(spark):
    """The contraction runs on component labels touched by the batch —
    its node count is bounded by the batch, not the label table."""
    from polars_grouper_spark.operators.connected_components import (
        components,
        incremental_components,
    )

    base = spark.createDataFrame(
        [(f"n{i}", f"n{i + 1000}") for i in range(500)],
        "`from` string, `to` string",
    )
    labels = components(base)
    batch = spark.createDataFrame(
        [("n1", "n2")], "`from` string, `to` string"
    )
    out = incremental_components(labels, batch)
    # 500 two-node components; the batch merges exactly two of them
    n_comps = out.select("component").distinct().count()
    assert n_comps == 499

def test_chained_incremental_over_nested_slices_equals_full_per_level(spark):
    """The percolation composition (round-6): for NESTED edge subsets
    E1 ⊂ E2 ⊂ E3, chaining incremental_components over the deltas must
    equal a full components() run on each cumulative slice — for random
    graphs, not just the entry's supplier-part data.  This is the
    invariant that lets percolation_sp replace 3 full CC runs with
    1 full + 2 delta merges."""
    import random

    from polars_grouper_spark.operators.connected_components import (
        components,
        incremental_components,
    )

    for seed in (11, 29, 47):
        rng = random.Random(seed)
        edges = [
            (f"v{rng.randrange(60)}", f"v{rng.randrange(60)}")
            for _ in range(150)
        ]
        # nested slices by deterministic position: first 50, 100, 150
        cuts = (50, 100, 150)
        df = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "`from` string, `to` string"
        )
        labels = None
        prev = 0
        for cut in cuts:
            delta = edges[prev:cut]
            prev = cut
            if labels is None:
                labels = components(df(delta)).select("node", "component")
            else:
                labels = incremental_components(labels, df(delta))
            got = sorted(map(tuple, labels.collect()))
            want = sorted(
                map(
                    tuple,
                    components(df(edges[:cut]))
                    .select("node", "component")
                    .collect(),
                )
            )
            assert got == want, f"seed={seed} cut={cut}"


def test_components_local_and_distributed_tiers_identical(spark):
    """Light-variant min-name labels are partition-pure: the local
    union-find tier must equal the star loop exactly (self-loops,
    duplicates, singleton coalescing included)."""
    from polars_grouper_spark.operators.connected_components import components

    edges = spark.createDataFrame(
        [(f"n{(3 * i) % 15}", f"n{(7 * i + 1) % 15}") for i in range(25)]
        + [("solo", "solo"), ("a", "b"), ("a", "b")],
        ["from", "to"],
    )
    loc = sorted(tuple(r) for r in components(edges).collect())
    dist = sorted(
        tuple(r) for r in components(edges, max_local_edges=0).collect()
    )
    assert loc == dist


def test_connected_components_local_and_distributed_tiers_identical(spark):
    """r9-opt: the numbering variant's local tier (union-find + local
    dense-rank of min first-seen) must equal the distributed star loop
    frame-for-frame — component labels AND 1..k group numbers — on a
    graph with self-loops, duplicate edges and singletons."""
    from polars_grouper_spark.operators.connected_components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(f"n{(3 * i) % 15}", f"n{(7 * i + 1) % 15}") for i in range(25)]
        + [("solo", "solo"), ("a", "b"), ("a", "b"), ("z9", "z1")],
        ["from", "to"],
    )
    loc = sorted(tuple(r) for r in connected_components(edges).collect())
    dist = sorted(
        tuple(r)
        for r in connected_components(edges, max_local_edges=0).collect()
    )
    assert loc == dist
