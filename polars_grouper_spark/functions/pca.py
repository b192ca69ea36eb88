"""One-pass PCA: distributed covariance, driver-side eigensolve.

The scale split every distributed PCA uses (Spark MLlib, Dask-ML): the
data-sized work is X^T X — a d×d covariance matrix accumulated in ONE
scan with map-side-combinable sums — and the eigendecomposition runs on
the driver over the d×d result (d = embedding width, 64 here; the
matrix is metadata, not data).  No iteration over the data, no
gradient steps: for d up to a few thousand this is exact PCA at any
row count.

Exactness: inputs quantize to integers (``floor(x·q)``, the engine's
shared quantization trick — truncation, not rounding, matching the
reference's weight quantization convention in
``src/shortest_path.rs:70``), so the three accumulators per cell
(Σxᵢ, Σxⱼ, Σxᵢxⱼ) are exact bigints under ANY aggregation order; the
single float division happens once per cell at the end.  Overflow
bound: |xq| ≤ q·|x|; Σxᵢxⱼ ≤ n·(q·|x|)² — at q=1000, |x| ≤ 5 this
tolerates ~3·10¹¹ rows before ANSI raises (visibly, not wrongly).

Plan shape: posexplode × in-row explode → d(d+1)/2 upper-triangle
cells per row, immediately crushed by a partial aggregate to ≤ d²
groups — the fan-out is CPU inside one stage, the shuffle carries
d(d+1)/2 rows per partition, constant in data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_cells(df: DataFrame, vec_col: str, quant: int) -> DataFrame:
    """Shared one-scan accumulator: upper-triangle ``(i, j, n, si, sj,
    sij)`` cells of exact bigint sums over the quantized values."""
    if quant < 1:
        raise ValueError(f"quant must be >= 1, got {quant}")
    base = df.where(F.col(vec_col).isNotNull()).select(F.col(vec_col).alias("_v"))
    ex = base.select(F.posexplode("_v").alias("i", "xi"), "_v")
    pairs = ex.select(
        "i",
        F.floor(F.col("xi").cast("double") * quant).cast("long").alias("qi"),
        F.posexplode("_v").alias("j", "xj"),
    ).where(F.col("j") >= F.col("i"))
    q = pairs.select(
        "i",
        "j",
        "qi",
        F.floor(F.col("xj").cast("double") * quant).cast("long").alias("qj"),
    )
    return q.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qi").alias("si"),
        F.sum("qj").alias("sj"),
        F.sum(F.col("qi") * F.col("qj")).alias("sij"),
    )


def covariance_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    quant: int = 1000,
    decimals: int = 6,
) -> DataFrame:
    """Upper-triangle covariance of an array column -> ``(dim_i, dim_j,
    n, cov)`` rows with ``dim_i <= dim_j`` and
    ``cov = (Σxᵢxⱼ - ΣxᵢΣxⱼ/n)/n`` (population covariance) over the
    quantized values, divided back by ``quant²`` and rounded.

    Null vectors drop; rows must share one width (posexplode pairs by
    position).
    """
    agg = _pair_cells(df, vec_col, quant)
    n = F.col("n").cast("double")
    cov = (
        (F.col("sij").cast("double") - F.col("si") * F.col("sj") / n)
        / n
        / F.lit(float(quant * quant))
    )
    return agg.select(
        F.col("i").cast("long").alias("dim_i"),
        F.col("j").cast("long").alias("dim_j"),
        "n",
        F.round(cov, decimals).alias("cov"),
    )


def covariance_matrix_sql(
    table_sql: str,
    vec_expr: str,
    *,
    quant: int = 1000,
    decimals: int = 6,
) -> str:
    """DuckDB oracle for :func:`covariance_matrix`."""
    return f"""
WITH src AS (
  SELECT {vec_expr} AS v FROM ({table_sql}) WHERE {vec_expr} IS NOT NULL
),
ex AS (
  SELECT generate_subscripts(v, 1) - 1 AS i,
         CAST(floor(unnest(v)::DOUBLE * {quant}) AS BIGINT) AS qi,
         v
  FROM src
),
pairs AS (
  SELECT i, qi,
         generate_subscripts(v, 1) - 1 AS j,
         CAST(floor(unnest(v)::DOUBLE * {quant}) AS BIGINT) AS qj
  FROM ex
),
agg AS (
  SELECT i, j, count(*)::BIGINT AS n,
         sum(qi)::BIGINT AS si, sum(qj)::BIGINT AS sj,
         sum(qi * qj)::BIGINT AS sij
  FROM pairs WHERE j >= i GROUP BY 1, 2
)
SELECT CAST(i AS BIGINT) AS dim_i, CAST(j AS BIGINT) AS dim_j, n,
       round((sij::DOUBLE - si::DOUBLE * sj / n) / n / {float(quant * quant)!r},
             {decimals}) AS cov
FROM agg
"""


def correlation_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    quant: int = 1000,
    decimals: int = 6,
) -> DataFrame:
    """Upper-triangle Pearson correlation -> ``(dim_i, dim_j, n, corr)``
    with ``dim_i <= dim_j`` — the same ONE data scan as
    :func:`covariance_matrix` (shared exact-bigint cells), plus a join
    against the d diagonal cells, which are metadata (broadcast).

    Engine-stable: ``corr = (n·sij − si·sj) / sqrt((n·sii − si²)(n·sjj −
    sj²))`` evaluated in doubles FROM the exact integer sums — the same
    IEEE operations in the same order on bit-identical inputs on both
    engines, so a round at ``decimals`` matches bit-for-bit.  The
    products run in doubles (not bigints) so row counts beyond the
    bigint bound degrade in precision, never raise.  Zero-variance
    dimensions yield NULL (not NaN) correlations."""
    cells = _pair_cells(df, vec_col, quant)
    diag = cells.where(F.col("i") == F.col("j")).select(
        F.col("i").alias("d"), F.col("si").alias("sd"), F.col("sij").alias("sdd")
    )
    n = F.col("n").cast("double")
    num = n * F.col("sij").cast("double") - F.col("si").cast("double") * F.col(
        "sj"
    ).cast("double")
    den_i = n * F.col("sii").cast("double") - F.col("si").cast("double") * F.col(
        "si"
    ).cast("double")
    den_j = n * F.col("sjj").cast("double") - F.col("sj").cast("double") * F.col(
        "sj"
    ).cast("double")
    joined = (
        cells.join(
            F.broadcast(diag.select(F.col("d").alias("i"), F.col("sdd").alias("sii"))),
            "i",
        )
        .join(
            F.broadcast(diag.select(F.col("d").alias("j"), F.col("sdd").alias("sjj"))),
            "j",
        )
    )
    corr = F.when(
        (den_i > 0) & (den_j > 0), num / F.sqrt(den_i * den_j)
    )
    return joined.select(
        F.col("i").cast("long").alias("dim_i"),
        F.col("j").cast("long").alias("dim_j"),
        "n",
        F.round(corr, decimals).alias("corr"),
    )


def correlation_matrix_sql(
    table_sql: str,
    vec_expr: str,
    *,
    quant: int = 1000,
    decimals: int = 6,
) -> str:
    """DuckDB oracle for :func:`correlation_matrix` — same integer cells,
    same double formula, same round."""
    return f"""
WITH src AS (
  SELECT {vec_expr} AS v FROM ({table_sql}) WHERE {vec_expr} IS NOT NULL
),
ex AS (
  SELECT generate_subscripts(v, 1) - 1 AS i,
         CAST(floor(unnest(v)::DOUBLE * {quant}) AS BIGINT) AS qi,
         v
  FROM src
),
pairs AS (
  SELECT i, qi,
         generate_subscripts(v, 1) - 1 AS j,
         CAST(floor(unnest(v)::DOUBLE * {quant}) AS BIGINT) AS qj
  FROM ex
),
cells AS (
  SELECT i, j, count(*)::BIGINT AS n,
         sum(qi)::BIGINT AS si, sum(qj)::BIGINT AS sj,
         sum(qi * qj)::BIGINT AS sij
  FROM pairs WHERE j >= i GROUP BY 1, 2
),
diag AS (SELECT i AS d, sij AS sdd FROM cells WHERE i = j)
SELECT CAST(c.i AS BIGINT) AS dim_i, CAST(c.j AS BIGINT) AS dim_j, c.n,
       round(CASE WHEN (c.n::DOUBLE * di.sdd::DOUBLE - c.si::DOUBLE * c.si::DOUBLE) > 0
                   AND (c.n::DOUBLE * dj.sdd::DOUBLE - c.sj::DOUBLE * c.sj::DOUBLE) > 0
             THEN (c.n::DOUBLE * c.sij::DOUBLE - c.si::DOUBLE * c.sj::DOUBLE)
                  / sqrt((c.n::DOUBLE * di.sdd::DOUBLE - c.si::DOUBLE * c.si::DOUBLE)
                         * (c.n::DOUBLE * dj.sdd::DOUBLE - c.sj::DOUBLE * c.sj::DOUBLE))
             END, {decimals}) AS corr
FROM cells c
JOIN diag di ON di.d = c.i
JOIN diag dj ON dj.d = c.j
"""


def top_principal_component(
    cov_df: DataFrame, dim: int, *, iters: int = 200
) -> "tuple[list[float], float]":
    """Driver-side eigensolve of a collected upper-triangle covariance
    frame -> (unit eigenvector, eigenvalue) of the largest component,
    by power iteration on the d×d matrix (d² floats — metadata, the
    documented driver-side bound).  Sign convention: the largest-|.|
    coordinate is made positive, so the result is deterministic."""
    import numpy as np

    m = np.zeros((dim, dim))
    for r in cov_df.select("dim_i", "dim_j", "cov").collect():
        m[r["dim_i"], r["dim_j"]] = r["cov"]
        m[r["dim_j"], r["dim_i"]] = r["cov"]
    v = np.ones(dim) / np.sqrt(dim)
    for _ in range(iters):
        nv = m @ v
        norm = np.linalg.norm(nv)
        if norm == 0.0:
            break
        v = nv / norm
    k = int(np.argmax(np.abs(v)))
    if v[k] < 0:
        v = -v
    return v.tolist(), float(v @ m @ v)
