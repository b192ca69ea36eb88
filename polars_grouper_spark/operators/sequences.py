"""Event-order mining: which event types precede which, per user.

The sequence-mining primitive behind funnel discovery ("what do users do
before purchasing?") and Markov-ish journey models: for every ordered
pair of event types (a, b), the number of users who performed some
``a`` STRICTLY BEFORE some ``b``.  The naive formulation self-joins the
event log on user (O(events²) within each user); this operator reduces
each user to one row per event type first — ``(user, type, min_ts,
max_ts)`` — because "some a before some b" is exactly
``min_ts(a) < max_ts(b)``.  The self-join then runs on the per-user
TYPE summaries: O(U · T²) rows with T = #event types (single digits),
never O(events²), and every shuffle is an equality join on ``user_id``.

At 100 TB: the summary aggregation is map-side combinable; the pair join
is per-user and bounded by T²; the final support count is another
map-side-combinable aggregation on (a, b) — T² output rows regardless
of input size.

Reference surface: none (beyond-reference operator, SURVEY.md §2
extension list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.iteration import truncate_lineage


def precedence_pairs(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Support counts for "some ``a`` strictly before some ``b``" ->
    ``(etype_a, etype_b, n_users, support_pct)`` for every ordered pair
    of DISTINCT event types with non-zero support.  ``support_pct`` is
    ``n_users / total users`` rounded to 6 (display; membership is
    decided by the exact timestamp comparison).  Null user/ts/type rows
    drop."""
    s = (
        df.where(
            F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(type_col).isNotNull()
        )
        .groupBy(
            F.col(user_col).alias("u"), F.col(type_col).alias("t")
        )
        .agg(F.min(ts_col).alias("mn"), F.max(ts_col).alias("mx"))
    )
    # the summary feeds BOTH the pair join and the total-user count —
    # checkpoint it so the raw scan/aggregation runs once, not per branch
    s = truncate_lineage(s)
    a = s.select("u", F.col("t").alias("etype_a"), "mn")
    b = s.select("u", F.col("t").alias("etype_b"), "mx")
    pairs = (
        a.join(b, "u")
        .where(
            (F.col("etype_a") != F.col("etype_b"))
            & (F.col("mn") < F.col("mx"))
        )
        .groupBy("etype_a", "etype_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    tot = s.groupBy().agg(F.count_distinct("u").alias("_n"))
    return pairs.crossJoin(F.broadcast(tot)).select(
        "etype_a",
        "etype_b",
        "n_users",
        F.round(
            F.col("n_users") / F.greatest(F.col("_n"), F.lit(1)).cast("double"),
            6,
        ).alias("support_pct"),
    )


def precedence_pairs_sql(events_sql: str) -> str:
    """DuckDB oracle replaying :func:`precedence_pairs` — ``events_sql``
    yields (u, ts, t)."""
    return f"""
WITH raw AS ({events_sql}),
s AS (
  SELECT u, t, min(ts) AS mn, max(ts) AS mx
  FROM raw WHERE u IS NOT NULL AND ts IS NOT NULL AND t IS NOT NULL
  GROUP BY u, t
),
tot AS (SELECT count(DISTINCT u) AS n FROM s)
SELECT a.t AS etype_a, b.t AS etype_b,
       count(*)::BIGINT AS n_users,
       round(count(*) / CAST(greatest(tot.n, 1) AS DOUBLE), 6) AS support_pct
FROM s a JOIN s b ON a.u = b.u AND a.t <> b.t AND a.mn < b.mx
CROSS JOIN tot
GROUP BY a.t, b.t, tot.n
"""

def markov_transitions(
    df: DataFrame,
    key_col: str,
    order_cols: "list[str]",
    state_col: str,
    *,
    decimals: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences -> ``(src_state, dst_state, n, p)``: for each observed
    state pair, the transition count and the row-normalized probability
    ``p = n / Σ_dst n`` — the behavioral model behind next-action
    prediction, journey simulation, and anomaly scoring (improbable
    transitions).

    Adjacency is ORDER-based (the immediate next event within the key,
    by the ``order_cols`` total order), not time-windowed — see
    ``precedence_pairs`` for the unordered co-occurrence variant.
    Plan: one lag/lead window per key (single shuffle), one
    map-side-combinable pair count, one per-source window sum for the
    normalizer (partition = distinct destination states of one source,
    bounded by the state alphabet).  Null keys/states drop.
    """
    k = F.col(key_col)
    s = F.col(state_col)
    base = df.where(k.isNotNull() & s.isNotNull())
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    pairs = base.select(
        s.cast("string").alias("src_state"),
        F.lead(s.cast("string")).over(w).alias("dst_state"),
    ).where(F.col("dst_state").isNotNull())
    counts = pairs.groupBy("src_state", "dst_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_src = Window.partitionBy("src_state")
    return counts.select(
        "src_state",
        "dst_state",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_src), decimals).alias("p"),
    )


def markov_transitions_sql(
    events_sql: str,
    key_expr: str,
    order_exprs: "list[str]",
    state_expr: str,
    *,
    decimals: int = 6,
) -> str:
    """DuckDB oracle for :func:`markov_transitions` — ``events_sql``
    yields the raw rows."""
    order = ", ".join(order_exprs)
    return f"""
WITH base AS (
  SELECT * FROM ({events_sql})
  WHERE {key_expr} IS NOT NULL AND {state_expr} IS NOT NULL
),
pairs AS (
  SELECT CAST({state_expr} AS VARCHAR) AS src_state,
         lead(CAST({state_expr} AS VARCHAR)) OVER (
           PARTITION BY {key_expr} ORDER BY {order}) AS dst_state
  FROM base
),
counts AS (
  SELECT src_state, dst_state, count(*)::BIGINT AS n
  FROM pairs WHERE dst_state IS NOT NULL GROUP BY 1, 2
)
SELECT src_state, dst_state, n,
       round(n / sum(n) OVER (PARTITION BY src_state), {decimals}) AS p
FROM counts
"""


def session_entry_exit(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    *,
    gap_minutes: int = 30,
) -> DataFrame:
    """Entry/exit-page analytics -> ``(entry_type, exit_type,
    n_sessions, n_bounces)``: sessionize by inactivity gap, take each
    session's first and last event type, count (entry, exit) pairs and
    single-event bounces — the landing/abandonment readout of every
    product-analytics stack.

    Session ids come from the classic gap construction: a per-user
    window flags gap-starts, a running sum numbers sessions — one
    user-keyed shuffle; everything after aggregates on (user, session).
    In-session order is total — (ts, id) — so first/last are
    deterministic under ties."""
    if gap_minutes < 1:
        raise ValueError(f"gap_minutes must be >= 1, got {gap_minutes}")
    gap_s = gap_minutes * 60
    src = df.where(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.unix_timestamp(F.col(ts_col)).alias("t"),
        F.col(type_col).cast("string").alias("et"),
        F.col(id_col).alias("eid"),
    )
    w = Window.partitionBy("u").orderBy("t", "eid")
    new_sess = (
        F.col("t") - F.lag("t").over(w) > F.lit(gap_s)
    ) | F.lag("t").over(w).isNull()
    sessions = src.select(
        "u",
        "t",
        "et",
        "eid",
        F.sum(new_sess.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("sid"),
    )
    per = sessions.groupBy("u", "sid").agg(
        F.min_by("et", F.struct("t", "eid")).alias("entry_type"),
        F.max_by("et", F.struct("t", "eid")).alias("exit_type"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    return per.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("n_ev") == 1).cast("long")).alias("n_bounces"),
    )


def session_entry_exit_sql(
    events_sql: str, *, gap_minutes: int = 30
) -> str:
    """DuckDB oracle for :func:`session_entry_exit` — ``events_sql``
    yields (u, ts, et, eid)."""
    gap_s = gap_minutes * 60
    return f"""
WITH src AS (
  SELECT u, CAST(epoch(ts) AS BIGINT) AS t, CAST(et AS VARCHAR) AS et, eid
  FROM ({events_sql})
  WHERE u IS NOT NULL AND ts IS NOT NULL AND et IS NOT NULL
),
flagged AS (
  SELECT u, t, et, eid,
         CASE WHEN lag(t) OVER w IS NULL
                OR t - lag(t) OVER w > {gap_s} THEN 1 ELSE 0 END AS ns
  FROM src WINDOW w AS (PARTITION BY u ORDER BY t, eid)
),
sess AS (
  SELECT u, t, et, eid,
         sum(ns) OVER (PARTITION BY u ORDER BY t, eid
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
per AS (
  SELECT u, sid,
         first(et ORDER BY t, eid) AS entry_type,
         last(et ORDER BY t, eid) AS exit_type,
         count(*) AS n_ev
  FROM sess GROUP BY u, sid
)
SELECT entry_type, exit_type, count(*) AS n_sessions,
       CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces
FROM per GROUP BY 1, 2
"""
