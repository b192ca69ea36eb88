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

from pyspark.sql import DataFrame
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
