"""Co-occurrence association-rule mining — fully relational Spark SQL.

Reference parity: ``/root/reference/src/association_rule_graph_mining.rs``
and ``/root/reference/polars_grouper/__init__.py:455-550``.

This is NOT classic Apriori — only 1-item antecedent → 1-item consequent
pairwise co-occurrence, plus graph-derived "patterns".  The reference's
observable quirks, all replicated:

- Rows with any null field are dropped; missing frequency column ⇒ 1.0.
- ``support_count[item]`` accumulates *per row* (an item twice in one
  transaction counts twice): ``+= freq`` if weighted else ``+= 1.0``
  (``association_rule_graph_mining.rs:37-42``).
- ``total_transactions`` = number of distinct transaction ids.
- Valid items: ``support/total >= min_support`` (support = freq-sum when
  weighted else row-count).
- Transactions with more than ``max_itemset_size`` rows are skipped for
  association building only (``:65-67``).
- For every ordered pair of *row positions* with distinct valid items in a
  kept transaction: confidence = ``freq1*freq2/support_count[antecedent]``
  (weighted) or ``support_count[antecedent]/total`` (unweighted — the
  consequent is ignored; quirk, ``:77-81``).  Pairs with confidence >=
  ``min_confidence`` accumulate WITHOUT dedup across transactions/rows.
- ``lift_score`` = sum of all of an item's association confidences.
- ``pattern`` = DFS-forest id over the directed association graph,
  visiting items in first-appearance order (``:114-135``).  Equivalent
  closed form (provable): an item's pattern root is the minimum-id item
  that can *reach* it; patterns are numbered 1..k by root id ascending.
  Computed here via min-label propagation along reversed edges — a small
  driver-side loop over the items-level graph (|items| rows, tiny next to
  the row-level data).
- Output rows: valid items in first-appearance order; ``consequents`` /
  ``confidence_scores`` are the top-5 associations by confidence
  descending.  The reference's tie order within equal confidences is
  unstable (HashMap iteration); we define the deterministic tie-break
  (consequent name ascending).

Scale notes: the heavy steps are the transaction self-join (shuffle on
transaction_id — AQE skew-join handles hot transactions; oversized
transactions are filtered *before* the join, which also caps the quadratic
blowup per transaction at max_itemset_size²) and the per-antecedent
aggregations (map-side combinable).  The pattern loop runs on the distinct
item-pair graph, which is bounded by |valid items|², not by data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_grouper_spark.plans.parallelism import local_result

from polars_grouper_spark.plans.iteration import fingerprint, truncate_lineage
from polars_grouper_spark.plans.skew import salted_agg

_PATTERN_MAX_ROUNDS = 64


_PATTERN_DRIVER_MAX_EDGES = 200_000


def _pattern_labels_local(rows) -> list[tuple[int, int]]:
    """Exact min-reachable-root on a collected edge list: process roots in
    ascending id order, DFS forward over unlabeled nodes — O(V+E).  If a
    DFS hits a node labeled by a smaller root, everything beyond it is
    already labeled smaller (reachability is transitive), so it prunes.
    """
    adj: dict[int, list[int]] = {}
    nodes: set[int] = set()
    for a, c in rows:
        adj.setdefault(a, []).append(c)
        nodes.add(a)
        nodes.add(c)
    label: dict[int, int] = {}
    for r in sorted(nodes):
        if r in label:
            continue
        stack = [r]
        label[r] = r
        while stack:
            v = stack.pop()
            for w in adj.get(v, ()):
                if w not in label:
                    label[w] = r
                    stack.append(w)
    return sorted(label.items())


def _pattern_labels(assoc_edges: DataFrame) -> DataFrame:
    """Min-reachable-root labels over the directed item graph.

    assoc_edges: (a long, c long) distinct directed edges (antecedent id →
    consequent id).  Returns (iid long, root long): root = min item id that
    reaches iid (including itself).

    The item graph is metadata-scale by construction (bounded by
    |valid items|², independent of row volume), so when it fits under
    ``_PATTERN_DRIVER_MAX_EDGES`` it is collected and solved exactly on the
    driver in one pass instead of running a multi-job distributed fixpoint.
    Larger item vocabularies fall back to the min-label propagation loop.
    """
    spark = assoc_edges.sparkSession
    # Probe via checkpoint + count + collect (r9-opt): ``limit(K+1)``
    # goes through executeTake, which under AQE executes partitions
    # incrementally through the driver (the bpe probe measured it 3x
    # slower than checkpoint+count); the checkpoint is also what the
    # distributed fallback would want materialized anyway.
    assoc_edges = truncate_lineage(assoc_edges)
    if assoc_edges.count() <= _PATTERN_DRIVER_MAX_EDGES:
        sample = assoc_edges.collect()
        labeled = _pattern_labels_local([(r["a"], r["c"]) for r in sample])
        return local_result(spark, labeled, "iid long, root long")
    nodes = assoc_edges.select(F.col("a").alias("iid")).union(
        assoc_edges.select(F.col("c").alias("iid"))
    ).distinct()
    labels = truncate_lineage(nodes.select("iid", F.col("iid").alias("root")))
    prev = None
    for _ in range(_PATTERN_MAX_ROUNDS):
        prop = (
            assoc_edges.join(labels, assoc_edges["a"] == labels["iid"])
            .select(F.col("c").alias("iid"), F.col("root"))
        )
        new_labels = (
            labels.union(prop).groupBy("iid").agg(F.min("root").alias("root"))
        )
        new_labels = truncate_lineage(new_labels)
        fp = fingerprint(new_labels, "iid", "root")
        if fp == prev:
            break
        prev = fp
        labels = new_labels
    return labels


def graph_association_rules(
    df: DataFrame,
    transaction_col: str = "transaction_id",
    item_col: str = "item_id",
    frequency_col: str | None = "frequency",
    min_support: float = 0.05,
    min_confidence: float = 0.5,
    max_itemset_size: int = 50,
    weighted: bool = False,
    with_patterns: bool = True,
    skew_safe: bool = False,
) -> DataFrame:
    """Table function → ``(item, support, lift_score, pattern, consequents,
    confidence_scores)`` — the reference struct, pre-flattened.

    ``with_patterns=False`` skips the pattern-labeling loop (emits pattern
    0) for consumers that don't need it — saves several jobs.

    ``skew_safe=True`` replaces the top-5 window + ``collect_list`` (which
    ships every association of a hot antecedent to one reducer) with a
    two-phase salted aggregation: each ``(antecedent, salt)`` bucket keeps
    its local top-5 (``slice(sort_array(collect_list(struct)))``), then the
    ≤ ``n_salts``·5 partials per antecedent merge in a tiny second pass.
    Exact — the global top-5 of a union is contained in the union of
    per-bucket top-5s, and duplicate pairs (the reference's no-dedup
    accumulation) survive because every row lands in exactly one salt
    bucket.  Same output, no per-key reducer hotspot at 100 TB.
    """
    freq = (
        F.col(frequency_col).cast("double")
        if frequency_col is not None
        else F.lit(1.0)
    )
    t = df.select(
        F.col(transaction_col).cast("long").alias("tx"),
        F.col(item_col).cast("string").alias("item"),
        freq.alias("freq"),
        F.monotonically_increasing_id().alias("_i"),
    ).where(F.col("tx").isNotNull() & F.col("item").isNotNull() & F.col("freq").isNotNull())
    # ``t`` IS checkpointed (r10): it has THREE consumers (tx_sizes,
    # items, tv) and the callers' transaction frames are join-bearing
    # (brand tx = lineitem ⋈ part), so each re-computation re-ran that
    # join — profiled as four separate 0.2-0.4 s scan+join stage jobs in
    # assoc_top5.  Materializing once also freezes the nondeterministic
    # ``_i`` for every consumer (strictly safer than the previous
    # single-reader argument).
    t = truncate_lineage(t)

    # One shuffle serves both transaction-level needs: the per-transaction
    # sizes (for the max_itemset_size filter) and the distinct-transaction
    # count (a cheap count over the checkpointed aggregate, not a second
    # full countDistinct scan).
    tx_sizes = truncate_lineage(t.groupBy("tx").agg(F.count(F.lit(1)).alias("sz")))
    total_tx = tx_sizes.count()
    if total_tx == 0:
        spark = df.sparkSession
        return spark.createDataFrame(
            [],
            schema=(
                "item string, support double, lift_score double, pattern long, "
                "consequents array<string>, confidence_scores array<double>"
            ),
        )

    # Per-item metrics; iid = first-appearance order (reference intern order).
    items = t.groupBy("item").agg(
        F.min("_i").alias("iid"),
        F.count(F.lit(1)).alias("row_count"),
        F.sum("freq").alias("freq_sum"),
    )
    support_col = F.col("freq_sum") if weighted else F.col("row_count").cast("double")
    items = items.select(
        "item",
        "iid",
        support_col.alias("support_count"),
        (support_col / F.lit(float(total_tx)) >= F.lit(min_support)).alias("valid"),
    )
    items = truncate_lineage(items)
    valid_items = items.where("valid")

    # Transactions kept for association building.
    kept_tx = tx_sizes.where(F.col("sz") <= F.lit(max_itemset_size)).select("tx")

    tv = (
        t.join(kept_tx, "tx")
        .join(
            valid_items.select(
                F.col("item"), F.col("iid"), F.col("support_count")
            ),
            "item",
        )
        .select("tx", "item", "freq", "iid", "support_count")
    )

    tv = truncate_lineage(tv)

    # Row-position-level ordered pairs within a transaction, via the tx
    # self-join.  (A one-shuffle groupBy(tx)+collect_list+nested-transform
    # cross product was benchmarked 2× SLOWER here: building struct arrays
    # inside nested HOF lambdas drops out of whole-stage codegen, while
    # the self-join of the checkpointed ``tv`` is two cheap columnar
    # exchanges that AQE sizes; per-tx blowup is capped at
    # max_itemset_size² by the upstream filter either way.)
    a = tv.select(
        F.col("tx"),
        F.col("item").alias("antecedent"),
        F.col("iid").alias("a_iid"),
        F.col("freq").alias("freq1"),
        F.col("support_count").alias("a_support"),
    )
    b = tv.select(
        F.col("tx"),
        F.col("item").alias("consequent"),
        F.col("iid").alias("c_iid"),
        F.col("freq").alias("freq2"),
    )
    if weighted:
        conf = (F.col("freq1") * F.col("freq2")) / F.col("a_support")
    else:
        conf = F.col("a_support") / F.lit(float(total_tx))
    pairs = (
        a.join(b, "tx")
        .where(F.col("antecedent") != F.col("consequent"))
        .select("antecedent", "a_iid", "consequent", "c_iid", conf.alias("confidence"))
        .where(F.col("confidence") >= F.lit(min_confidence))
    )
    # r9-opt: collapse duplicate pair instances straight out of the
    # self-join (guide §2.3, aggregate before you shuffle).  The
    # reference accumulates pairs WITHOUT dedup across transactions/row
    # positions, so the same (antecedent, consequent, confidence) row
    # repeats once per co-occurrence — measured 3840× multiplicity on
    # the sf0.1 brand-pair data (2.3M instances, 600 groups).  Counting
    # the multiplicity in a map-side-combinable aggregation makes the
    # checkpoint, the top-5 pass and the pattern-edge distinct all run
    # on the group table; the top-5 *instances* (duplicates included)
    # are reconstructed exactly from the counts downstream.  Grouping
    # by the confidence value is exact: equal float bits collapse,
    # different bits stay distinct — the instance multiset is preserved
    # verbatim.
    grouped = pairs.groupBy("a_iid", "consequent", "c_iid", "confidence").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # Checkpoint only when a second consumer exists (r10): the top-5
    # pass is the sole reader when with_patterns=False — an eager
    # materialization there was one extra job chain per call.
    if with_patterns:
        grouped = truncate_lineage(grouped)

    # top-5 by confidence desc, tie-break consequent asc, as parallel arrays.
    # Struct sort is lexicographic by field order, so (-confidence,
    # consequent) ascending == (confidence desc, consequent asc); the raw
    # confidence rides along as the third field so the output never
    # round-trips through negation (-0.0 hygiene); the instance count is
    # the fourth field (never reached — (nc, consequent) is unique per
    # antecedent after the collapse).
    _rank_struct = F.struct(
        (-F.col("confidence")).alias("nc"),
        F.col("consequent").alias("consequent"),
        F.col("confidence").alias("confidence"),
        F.col("cnt").alias("cnt"),
    )
    # r9-opt: lift (sum of ALL confidences, pre-truncation) rides in the
    # same pass as the top-5 instead of a second aggregation plus a
    # third join in the assembly below — one shuffle and one join
    # fewer.  In the UNWEIGHTED case every pair of an antecedent
    # carries the same confidence (a_support / total_tx), so the sum is
    # computed algebraically as pair_count × confidence — exact,
    # order-free, and therefore bit-identical between the window and
    # salted paths.  The weighted sum is Σ confidence × count over the
    # collapsed groups — a per-path float accumulation, stable at the
    # oracle's 9 dp like every other float aggregate in the engine.
    if skew_safe:
        # lift_part: integer instance count (unweighted — counts merge
        # exactly, the single n × c multiply happens once after the
        # merge) or the float partial sum (weighted).  A collapsed
        # group lands in exactly ONE salt bucket, so per-bucket group
        # lists never split a group and the first 5 groups of any
        # bucket contain at least the bucket's top-5 instances.
        lift_part = (
            F.sum("cnt")
            if not weighted
            else F.sum(F.col("confidence") * F.col("cnt"))
        ).alias("lift_part")
        merged = salted_agg(
            grouped.select("a_iid", "confidence", "cnt", _rank_struct.alias("s")),
            ["a_iid"],
            [
                F.slice(F.sort_array(F.collect_list("s")), 1, 5).alias("part"),
                lift_part,
            ],
            lambda p: [
                F.slice(
                    F.sort_array(F.flatten(F.collect_list("part"))), 1, 5
                ).alias("assoc"),
                F.sum("lift_part").alias("lift_raw"),
            ],
        )
        lift_score = (
            F.col("lift_raw").cast("double")
            * F.element_at("assoc", 1)["confidence"]
            if not weighted
            else F.col("lift_raw")
        )
        cons_arr, conf_arr = _top5_instance_arrays(F.col("assoc"))
        top5 = merged.select(
            "a_iid",
            lift_score.alias("lift_score"),
            cons_arr,
            conf_arr,
        )
    else:
        top5 = _window_top5(grouped, _rank_struct, weighted=weighted)

    # patterns over the distinct directed association graph.
    if with_patterns:
        assoc_edges = grouped.select(
            F.col("a_iid").alias("a"), F.col("c_iid").alias("c")
        ).distinct()
        labels = _pattern_labels(assoc_edges)
        item_roots = (
            valid_items.join(labels, valid_items["iid"] == labels["iid"], "left")
            .select(
                valid_items["item"],
                valid_items["iid"],
                F.coalesce("root", valid_items["iid"]).alias("root"),
            )
        )
        roots = item_roots.select("root").distinct()
        numbering = roots.withColumn(
            "pattern", F.dense_rank().over(Window.orderBy("root")).cast("long")
        )
        patterns = item_roots.join(numbering, "root").select("item", "iid", "pattern")
    else:
        patterns = valid_items.select("item", "iid", F.lit(0).cast("long").alias("pattern"))

    out = (
        valid_items.select("item", "iid", F.col("support_count").alias("support"))
        .join(patterns.select("iid", "pattern"), "iid")
        .join(top5.withColumnRenamed("a_iid", "iid"), "iid", "left")
        .select(
            "item",
            "support",
            F.coalesce("lift_score", F.lit(0.0)).alias("lift_score"),
            "pattern",
            F.coalesce("consequents", F.array().cast("array<string>")).alias("consequents"),
            F.coalesce(
                "confidence_scores", F.array().cast("array<double>")
            ).alias("confidence_scores"),
            "iid",
        )
        .orderBy("iid")
        .drop("iid")
    )
    return out


def _top5_instance_arrays(groups):
    """Expand a (nc, consequent, confidence, cnt)-struct array — sorted,
    ≤5 groups, each carrying its instance count — into the exact top-5
    INSTANCE arrays (duplicates included, the reference's no-dedup
    accumulation) via a pure-expression fold: walk the groups in rank
    order, taking ``min(cnt, remaining)`` copies of each until 5
    instances are emitted.  ``array_repeat`` clamps a non-positive count
    to an empty array, so exhausted remainders contribute nothing."""
    take = lambda a, x: F.least(x["cnt"], a["rem"]).cast("int")  # noqa: E731
    folded = F.aggregate(
        groups,
        F.struct(
            F.lit(5).cast("long").alias("rem"),
            F.array().cast("array<string>").alias("cs"),
            F.array().cast("array<double>").alias("vs"),
        ),
        lambda a, x: F.struct(
            (a["rem"] - F.least(x["cnt"], a["rem"])).alias("rem"),
            F.concat(a["cs"], F.array_repeat(x["consequent"], take(a, x))).alias("cs"),
            F.concat(a["vs"], F.array_repeat(x["confidence"], take(a, x))).alias("vs"),
        ),
    )
    return (
        folded["cs"].alias("consequents"),
        folded["vs"].alias("confidence_scores"),
    )


def _window_top5(grouped: DataFrame, rank_struct, *, weighted: bool) -> DataFrame:
    """Default top-5 path over the COLLAPSED pair groups: a running
    instance-count window keeps only the groups that contribute to the
    top 5 instances, then one groupBy assembles the arrays.

    The lift sum shares the window's exchange (same partition key), and
    the following groupBy on that key reuses the partitioning — top-5,
    lift and the list assembly all ride ONE shuffle of the group table
    (≤ |valid items|² rows, however heavy the raw co-occurrence data).
    Unweighted lift is the algebraic instance_count × confidence (exact
    and order-free — matches the salted path bit-for-bit); weighted lift
    is Σ confidence × count over the groups.
    """
    w = Window.partitionBy("a_iid")
    wo = w.orderBy(
        F.col("confidence").desc(), F.col("consequent").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lift = (
        F.sum("cnt").over(w) * F.col("confidence")
        if not weighted
        else F.sum(F.col("confidence") * F.col("cnt")).over(w)
    )
    kept = (
        grouped.withColumn("_end", F.sum("cnt").over(wo))
        .withColumn("lift", lift)
        .where(F.col("_end") - F.col("cnt") < 5)
    )
    assembled = kept.groupBy("a_iid").agg(
        F.max("lift").alias("lift_score"),
        F.sort_array(F.collect_list(rank_struct)).alias("assoc"),
    )
    cons_arr, conf_arr = _top5_instance_arrays(F.col("assoc"))
    return assembled.select("a_iid", "lift_score", cons_arr, conf_arr)
