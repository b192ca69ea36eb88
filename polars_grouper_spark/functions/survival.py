"""Kaplan–Meier survival estimation (Kaplan & Meier 1958).

Retention analysis done right: "what fraction of users survive past t"
cannot be answered by naive averaging when observation windows differ —
users still active at the data's edge are CENSORED (their lifetime is
only known to exceed what we saw), and dropping or counting them as
churned both bias the curve.  The KM product-limit estimator handles
censoring exactly:

    S(t) = prod over event times t_i <= t of (1 - d_i / n_i)

with ``d_i`` deaths at ``t_i`` and ``n_i`` the at-risk count (subjects
whose observed duration >= t_i, censored or not).

Shape: one aggregation to the per-duration (deaths, censored) table —
bounded by the number of DISTINCT durations, not subjects — then
at-risk counts and the running product as windows over that tiny
table.  The product is computed as ``exp(sum(ln(...)))`` — a cumulative
float over per-step ratios whose printed value rounds to 6 (membership
— which rows exist — is pure integer grouping).  A step where everyone
at risk dies (d == n) sends survival to exactly 0 from then on, handled
explicitly rather than through ``ln(0)``.

Reference surface: none (beyond-reference operator, SURVEY.md §2
extension list).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration_col: Column | str,
    observed_col: Column | str,
    *,
    decimals: int = 6,
) -> DataFrame:
    """Survival curve -> ``(t, n_risk, n_death, n_censor, survival)``,
    one row per distinct observed duration (integer units; censor-only
    times appear with n_death = 0 and an unchanged survival level).
    ``observed_col`` is 1/true for a death (churn) and 0/false for a
    censored subject.  Null durations/flags drop."""
    d = (F.col(duration_col) if isinstance(duration_col, str) else duration_col).cast("long")
    o = (F.col(observed_col) if isinstance(observed_col, str) else observed_col).cast("int")
    src = df.where(d.isNotNull() & o.isNotNull()).select(
        d.alias("t"), o.alias("obs")
    )
    per_t = src.groupBy("t").agg(
        F.sum("obs").alias("n_death"),
        F.sum(1 - F.col("obs")).alias("n_censor"),
        F.count(F.lit(1)).alias("n_at"),
    )
    w_after = Window.orderBy("t").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    at_risk = per_t.select(
        "t",
        "n_death",
        "n_censor",
        F.sum("n_at").over(w_after).alias("n_risk"),
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # dead step (d == n): everyone at risk dies -> survival exactly 0 from
    # here on; flag it and zero the output instead of ln(0)
    step = F.when(
        F.col("n_death") < F.col("n_risk"),
        F.log(
            (F.col("n_risk") - F.col("n_death"))
            / F.col("n_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    died_out = F.max(
        (F.col("n_death") == F.col("n_risk")).cast("int")
    ).over(w_cum)
    surv = F.when(died_out == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(step).over(w_cum))
    )
    return at_risk.select(
        "t",
        "n_risk",
        "n_death",
        "n_censor",
        F.round(surv, decimals).alias("survival"),
    )


def kaplan_meier_sql(
    src_sql: str, *, decimals: int = 6
) -> str:
    """DuckDB oracle for :func:`kaplan_meier` — ``src_sql`` yields
    (t, obs) with integer duration and 0/1 observed flag."""
    return f"""
WITH src AS ({src_sql}),
clean AS (
  SELECT CAST(t AS BIGINT) AS t, CAST(obs AS INT) AS obs FROM src
  WHERE t IS NOT NULL AND obs IS NOT NULL
),
per_t AS (
  SELECT t, sum(obs)::BIGINT AS n_death,
         sum(1 - obs)::BIGINT AS n_censor,
         count(*)::BIGINT AS n_at
  FROM clean GROUP BY t
),
at_risk AS (
  -- CAST: DuckDB sum(BIGINT) widens to HUGEINT, which round-trips
  -- differently than int64 through Arrow; Spark emits BIGINT here.
  SELECT t, n_death, n_censor,
         CAST(sum(n_at) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                              AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
  FROM per_t
),
curve AS (
  SELECT t, n_risk, n_death, n_censor,
         CASE WHEN max(CASE WHEN n_death = n_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) = 1
              THEN 0.0
              ELSE exp(sum(CASE WHEN n_death < n_risk
                           THEN ln((n_risk - n_death) / CAST(n_risk AS DOUBLE))
                           ELSE 0.0 END)
                       OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW))
         END AS survival
  FROM at_risk
)
SELECT t, n_risk, n_death, n_censor, round(survival, {decimals}) AS survival
FROM curve
"""
