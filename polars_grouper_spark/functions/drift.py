"""Dataset drift detection: PSI over value distributions, term-shift
over text corpora.

The monitoring layer of a training pipeline: "did this week's crawl
change under us?".  Two complementary views:

- :func:`psi_drift` — Population Stability Index over a fixed bucket
  grid (the credit-scoring standard: PSI < 0.1 stable, > 0.25 action).
  Reuses the fixed-grid histogram contract of ``sketches``: both sides
  reduce to ``bins`` counting rows, mergeable and tiny, so the compare
  runs on summaries — at 100 TB you PSI yesterday's persisted histogram
  against today's without touching either raw dataset again.
- :func:`term_drift` — terms whose document frequency shifted by more
  than ``ratio`` between two corpus snapshots (new spam template, lost
  source, language mix change).  Membership is decided ENTIRELY by
  integer cross-products over smoothed counts — the repo's
  float-selection rule — and the reported log2 ratio is display-only.

Both emit bounded outputs (bins / shifted terms), never data-sized.

Reference surface: none (beyond-reference operators, SURVEY.md §2
extension list).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucketed(df: DataFrame, col, lo: float, hi: float, bins: int):
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    w = (hi - lo) / bins
    b = F.least(
        F.greatest(F.floor((c - F.lit(lo)) / F.lit(w)), F.lit(0)),
        F.lit(bins - 1),
    ).cast("int")
    return (
        df.where(c.isNotNull())
        .select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: Column | str,
    *,
    lo: float,
    hi: float,
    bins: int = 20,
) -> DataFrame:
    """Per-bucket PSI decomposition -> ``(bucket, cnt_a, cnt_b, contrib)``
    plus the grand total as bucket = -1: ``contrib = (pa - pb) *
    ln(pa / pb)`` with half-count smoothing (every bucket gets +0.5 on
    both sides, so empty buckets contribute finitely and membership
    never depends on a float).  Values outside [lo, hi) clamp into the
    edge buckets, as in ``sketches.hist_registers``."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    a = _bucketed(df_a, col, lo, hi, bins).withColumnRenamed("cnt", "ca")
    b = _bucketed(df_b, col, lo, hi, bins).withColumnRenamed("cnt", "cb")
    spark = df_a.sparkSession
    grid = spark.range(bins).select(F.col("id").cast("int").alias("bucket"))
    tot = (
        grid.join(a, "bucket", "left")
        .join(b, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("ca", F.lit(0)).alias("cnt_a"),
            F.coalesce("cb", F.lit(0)).alias("cnt_b"),
        )
    )
    na = F.sum("cnt_a").over(Window.partitionBy())
    nb = F.sum("cnt_b").over(Window.partitionBy())
    pa = (F.col("cnt_a") + F.lit(0.5)) / (na + F.lit(0.5 * bins))
    pb = (F.col("cnt_b") + F.lit(0.5)) / (nb + F.lit(0.5 * bins))
    from polars_grouper_spark.plans.iteration import truncate_lineage

    # per feeds both the output rows and the grand-total aggregate —
    # materialize once (it is bins-sized: metadata).
    per = truncate_lineage(
        tot.select(
            F.col("bucket").cast("long").alias("bucket"),
            "cnt_a",
            "cnt_b",
            F.round((pa - pb) * F.log(pa / pb), 6).alias("contrib"),
        )
    )
    total = per.groupBy().agg(
        F.lit(-1).cast("long").alias("bucket"),
        F.sum("cnt_a").alias("cnt_a"),
        F.sum("cnt_b").alias("cnt_b"),
        F.round(F.sum("contrib"), 6).alias("contrib"),
    )
    return per.unionAll(total)


def psi_drift_sql(
    a_sql: str,
    b_sql: str,
    expr: str,
    *,
    lo: float,
    hi: float,
    bins: int = 20,
) -> str:
    """DuckDB oracle for :func:`psi_drift` — each input yields rows with
    the value expression ``{expr}``."""
    w = (hi - lo) / bins

    def bucketed(src, alias):
        return f"""
  SELECT least(greatest(CAST(floor((CAST({expr} AS DOUBLE) - {lo!r}) / {w!r}) AS BIGINT), 0), {bins - 1}) AS bucket,
         count(*) AS cnt
  FROM ({src}) {alias} WHERE {expr} IS NOT NULL GROUP BY 1
"""

    return f"""
WITH a AS ({bucketed(a_sql, "sa")}),
b AS ({bucketed(b_sql, "sb")}),
grid AS (SELECT unnest(range({bins})) AS bucket),
tot AS (
  SELECT g.bucket, coalesce(a.cnt, 0) AS cnt_a, coalesce(b.cnt, 0) AS cnt_b
  FROM grid g LEFT JOIN a ON a.bucket = g.bucket LEFT JOIN b ON b.bucket = g.bucket
),
per AS (
  SELECT CAST(bucket AS BIGINT) AS bucket, cnt_a, cnt_b,
         round(((cnt_a + 0.5) / (sum(cnt_a) OVER () + {0.5 * bins})
                - (cnt_b + 0.5) / (sum(cnt_b) OVER () + {0.5 * bins}))
               * ln(((cnt_a + 0.5) / (sum(cnt_a) OVER () + {0.5 * bins}))
                    / ((cnt_b + 0.5) / (sum(cnt_b) OVER () + {0.5 * bins}))),
               6) AS contrib
  FROM tot
)
SELECT bucket, cnt_a, cnt_b, contrib FROM per
UNION ALL
SELECT -1, CAST(sum(cnt_a) AS BIGINT), CAST(sum(cnt_b) AS BIGINT),
       round(sum(contrib), 6)
FROM per
"""


def term_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str,
    *,
    ratio_num: int = 2,
    ratio_den: int = 1,
    min_docs: int = 5,
) -> DataFrame:
    """Terms whose smoothed document frequency shifted by more than
    ``ratio_num/ratio_den`` between snapshots ->
    ``(token, df_a, df_b, direction)`` with direction 'up' (more common
    in B) or 'down'.  Document frequency = number of docs containing the
    token; add-one smoothing; normalization by corpus doc counts.  The
    shift test is the exact integer cross-product

        (df_b + 1) * (NA + 1) * ratio_den > (df_a + 1) * (NB + 1) * ratio_num

    (and symmetrically for 'down'), so membership never depends on a
    float.  ``min_docs`` drops noise terms seen in fewer than that many
    docs on BOTH sides."""
    if ratio_num <= 0 or ratio_den <= 0:
        raise ValueError("ratio must be positive")

    def docfreq(df, name):
        return (
            df.where(F.col(text_col).isNotNull())
            .select(
                F.explode(
                    F.array_distinct(
                        F.split(F.lower(F.col(text_col)), r"\s+", -1)
                    )
                ).alias("token"),
            )
            .where(F.col("token") != "")
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(name))
        )

    na = df_a.where(F.col(text_col).isNotNull()).count()
    nb = df_b.where(F.col(text_col).isNotNull()).count()
    a = docfreq(df_a, "da")
    b = docfreq(df_b, "db")
    j = a.join(b, "token", "full").select(
        "token",
        F.coalesce("da", F.lit(0)).alias("df_a"),
        F.coalesce("db", F.lit(0)).alias("df_b"),
    )
    up = (F.col("df_b") + 1) * F.lit((na + 1) * ratio_den) > (
        F.col("df_a") + 1
    ) * F.lit((nb + 1) * ratio_num)
    down = (F.col("df_a") + 1) * F.lit((nb + 1) * ratio_den) > (
        F.col("df_b") + 1
    ) * F.lit((na + 1) * ratio_num)
    return (
        j.where(
            (F.greatest("df_a", "df_b") >= min_docs) & (up | down)
        )
        .select(
            "token",
            "df_a",
            "df_b",
            F.when(up, F.lit("up")).otherwise(F.lit("down")).alias("direction"),
        )
    )


def term_drift_sql(
    a_sql: str,
    b_sql: str,
    text_expr: str,
    *,
    ratio_num: int = 2,
    ratio_den: int = 1,
    min_docs: int = 5,
) -> str:
    """DuckDB oracle for :func:`term_drift`."""

    def docfreq(src, alias):
        return f"""
  SELECT t.token, count(*) AS df
  FROM (SELECT row_number() OVER () AS rid, {text_expr} AS txt
        FROM ({src}) {alias} WHERE {text_expr} IS NOT NULL) d,
       unnest(list_distinct(string_split_regex(lower(d.txt), '\\s+'))) AS t(token)
  WHERE t.token <> '' GROUP BY t.token
"""

    return f"""
WITH a AS ({docfreq(a_sql, "qa")}),
b AS ({docfreq(b_sql, "qb")}),
na AS (SELECT count(*) AS n FROM ({a_sql}) x WHERE {text_expr} IS NOT NULL),
nb AS (SELECT count(*) AS n FROM ({b_sql}) y WHERE {text_expr} IS NOT NULL),
j AS (
  SELECT coalesce(a.token, b.token) AS token,
         coalesce(a.df, 0) AS df_a, coalesce(b.df, 0) AS df_b
  FROM a FULL OUTER JOIN b ON a.token = b.token
)
SELECT token, df_a, df_b,
       CASE WHEN (df_b + 1) * ((SELECT n FROM na) + 1) * {ratio_den}
                 > (df_a + 1) * ((SELECT n FROM nb) + 1) * {ratio_num}
            THEN 'up' ELSE 'down' END AS direction
FROM j
WHERE greatest(df_a, df_b) >= {min_docs}
  AND ((df_b + 1) * ((SELECT n FROM na) + 1) * {ratio_den}
         > (df_a + 1) * ((SELECT n FROM nb) + 1) * {ratio_num}
    OR (df_a + 1) * ((SELECT n FROM nb) + 1) * {ratio_den}
         > (df_b + 1) * ((SELECT n FROM na) + 1) * {ratio_num})
"""


def ks_drift(df_a: DataFrame, df_b: DataFrame, col: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic -> one row
    ``(n_a, n_b, ks)`` with ``ks = max_v |F_a(v) - F_b(v)|``.

    The nonparametric companion to :func:`psi_drift`: no binning, no
    range assumption — the supremum CDF gap over the OBSERVED value
    set, which is where the supremum of an empirical-CDF difference
    always lands.  Exactness: the gap at each value is the integer
    ``|cum_a * n_b - cum_b * n_a|`` (cross-multiplied counts, no float
    CDFs), the max is an integer max, and the single final division by
    ``n_a * n_b`` is the only float op — bit-identical on both engines.
    Valid while ``n_a * n_b < 2^63`` (~3e9 rows per side); past that,
    pre-aggregate or sample a side.

    Scale: each side reduces to distinct values map-side; one full
    outer join on value; one ordered window over distinct values (the
    same sort any exact CDF needs); one max.
    """
    a = df_a.groupBy(F.col(col).alias("v")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    b = df_b.groupBy(F.col(col).alias("v")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    merged = (
        a.join(b, "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    cum = merged.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(wt).alias("n_a"),
        F.sum("cb").over(wt).alias("n_b"),
    )
    return cum.groupBy().agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        (
            F.max(
                F.abs(
                    F.col("cum_a") * F.col("n_b")
                    - F.col("cum_b") * F.col("n_a")
                )
            )
            / (F.max("n_a") * F.max("n_b")).cast("double")
        ).alias("ks"),
    )


def ks_drift_sql(a_sql: str, b_sql: str, expr: str) -> str:
    """DuckDB oracle for :func:`ks_drift` (same cross-multiplied
    integer gaps)."""
    return f"""
WITH a AS (SELECT {expr} AS v, COUNT(*) AS ca FROM ({a_sql}) GROUP BY 1),
b AS (SELECT {expr} AS v, COUNT(*) AS cb FROM ({b_sql}) GROUP BY 1),
merged AS (
  SELECT COALESCE(a.v, b.v) AS v,
         COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
  FROM a FULL OUTER JOIN b ON a.v = b.v
), cum AS (
  SELECT SUM(ca) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
         SUM(cb) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
         SUM(ca) OVER () AS n_a, SUM(cb) OVER () AS n_b
  FROM merged
)
SELECT CAST(MAX(n_a) AS BIGINT) AS n_a, CAST(MAX(n_b) AS BIGINT) AS n_b,
       MAX(ABS(cum_a * n_b - cum_b * n_a))
         / CAST(MAX(n_a) * MAX(n_b) AS DOUBLE) AS ks
FROM cum
"""


def emd_1d(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """1-D earth-mover (Wasserstein-1) distance between two samples ->
    ONE row ``(n_a, n_b, emd)`` over a shared fixed-width histogram —
    the mass-transport drift metric that, unlike PSI, is robust to
    empty bins and respects ORDER (shifting mass one bin costs less
    than shifting it ten).

    W1 = Σ_bins |CDF_a − CDF_b| · bin_width with CDFs as exact integer
    cumulative counts over each side's total — the per-bin |ΔCDF| terms
    are rationals of exact integers evaluated identically, and the
    final sum runs over the ORDERED bounded bin table (at most ``bins``
    rows, deterministic order on both engines via the ordered
    aggregation below).  Each side reduces to its histogram in one
    map-side-combinable pass."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / bins

    def hist(d: DataFrame, tag: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        b = F.greatest(
            F.lit(0),
            F.least(F.lit(bins - 1), F.floor((v - F.lit(lo)) / F.lit(width))),
        ).cast("int")
        return (
            d.where(v.isNotNull())
            .groupBy(b.alias("bucket"))
            .agg(F.count(F.lit(1)).alias(f"n_{tag}"))
        )
    ha, hb = hist(df_a, "a"), hist(df_b, "b")
    merged = ha.join(hb, "bucket", "full").select(
        "bucket",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    w_lead = Window.orderBy("bucket")
    tot = merged.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    # CDFs are piecewise-constant between PRESENT buckets, so each
    # |dCDF| term is weighted by the gap to the next present bucket —
    # absent bins in between carry the same CDF difference.  (The last
    # bucket's gap is irrelevant: both CDFs are 1 there, dCDF = 0.)
    cum = merged.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "ta",
        "tb",
        (F.sum("n_a").over(w).cast("double") / F.col("ta")).alias("_ca"),
        (F.sum("n_b").over(w).cast("double") / F.col("tb")).alias("_cb"),
        F.coalesce(
            F.lead("bucket", 1).over(w_lead) - F.col("bucket"), F.lit(1)
        ).cast("double").alias("_gap"),
    )
    # the weighted |dCDF| sum runs over <= bins rows; fold it in bucket
    # order via a sorted-array aggregate so float summation is pinned.
    folded = cum.agg(
        F.first("ta").alias("n_a"),
        F.first("tb").alias("n_b"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("bucket", "_ca", "_cb", "_gap"))
            ),
            F.lit(0.0),
            lambda acc, x: acc
            + F.abs(x["_ca"] - x["_cb"]) * x["_gap"] * F.lit(width),
        ).alias("emd"),
    )
    return folded.select("n_a", "n_b", F.round("emd", 9).alias("emd"))


def emd_1d_sql(
    a_sql: str,
    b_sql: str,
    expr: str,
    *,
    lo: float,
    hi: float,
    bins: int = 256,
) -> str:
    """DuckDB oracle for :func:`emd_1d` — the fold replays in the same
    bucket order via list_aggregate over the sorted struct list."""
    width = (hi - lo) / bins

    def hist(src: str, tag: str) -> str:
        return f"""
h_{tag} AS (
  SELECT CAST(greatest(0, least({bins - 1},
           floor((CAST({expr} AS DOUBLE) - {lo!r}) / {width!r}))) AS INT)
           AS bucket,
         count(*) AS n_{tag}
  FROM ({src}) WHERE {expr} IS NOT NULL GROUP BY 1
)"""

    return f"""
WITH {hist(a_sql, 'a').lstrip()},
{hist(b_sql, 'b').lstrip()},
merged AS (
  SELECT coalesce(h_a.bucket, h_b.bucket) AS bucket,
         coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
  FROM h_a FULL JOIN h_b USING (bucket)
),
tot AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM merged),
cum AS (
  SELECT bucket, ta, tb,
         CAST(sum(n_a) OVER (ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / ta AS ca,
         CAST(sum(n_b) OVER (ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / tb AS cb,
         CAST(coalesce(lead(bucket) OVER (ORDER BY bucket) - bucket, 1)
              AS DOUBLE) AS gap
  FROM merged CROSS JOIN tot
)
SELECT CAST(min(ta) AS BIGINT) AS n_a, CAST(min(tb) AS BIGINT) AS n_b,
       round(list_aggregate(
         list_transform(
           list_sort(list(struct_pack(b := bucket,
                                      d := abs(ca - cb) * gap))),
           x -> x.d * {width!r}
         ), 'sum'), 9) AS emd
FROM cum
"""
