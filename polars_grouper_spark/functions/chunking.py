"""Document chunking and sequence packing — LLM training-data staples.

- :func:`chunk_documents` — split each document into fixed-token-count
  windows with optional overlap (the RAG / long-context preprocessing
  step).  Pure array algebra over a STAGED token array (tokenize once
  per doc — see the O(L²) re-evaluation lesson in ``text.top_ngrams``),
  then one explode: corpus-linear, embarrassingly parallel, no shuffle
  at all until the caller aggregates.
- :func:`pack_sequences` — assign documents to fixed-token-budget
  training bins by contiguous prefix-sum division (each doc goes to the
  bin its exclusive running total falls in).  One window over the
  ordering key then a map-side-combinable aggregation.  Deterministic
  given the ordering column, which makes it reproducible across re-runs
  and engines — unlike best-fit packing whose result depends on
  driver-side iteration order.  A bin may overflow by less than one
  document (the standard streaming-packing contract); documents longer
  than the budget get a bin of their own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 100,
    overlap: int = 0,
) -> DataFrame:
    """Split documents into token windows ->
    ``(id, chunk_index, n_tokens, chunk_text)``; ``chunk_index`` starts
    at 0; the last chunk may be short; empty documents yield no chunks.

    ``overlap`` tokens are shared between consecutive chunks
    (stride = chunk_tokens - overlap).
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    staged = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_toks")
    ).where(F.size("_toks") > 0)
    # n_chunks = 1 if L <= chunk else 1 + ceil((L - chunk) / stride)
    length = F.size("_toks")
    extra = F.floor(
        (length - F.lit(chunk_tokens) + F.lit(stride - 1)) / F.lit(stride)
    ).cast("int")
    n_chunks = F.when(length <= chunk_tokens, F.lit(1)).otherwise(extra + 1)
    staged = staged.select("id", "_toks", n_chunks.alias("_nc"))
    chunks = staged.select(
        "id",
        "_toks",
        F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_index"),
    )
    piece = F.slice(
        F.col("_toks"), F.col("chunk_index") * stride + 1, chunk_tokens
    )
    return chunks.select(
        "id",
        "chunk_index",
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def chunk_documents_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 100,
    overlap: int = 0,
) -> str:
    """DuckDB oracle replicating :func:`chunk_documents`."""
    stride = chunk_tokens - overlap
    return f"""
WITH staged AS (
  SELECT {id_col} AS id,
         CASE WHEN trim({text_col}) = '' THEN []
              ELSE regexp_split_to_array(trim({text_col}), '\\s+') END AS t
  FROM {table}
),
sized AS (
  SELECT id, t, len(t) AS L,
         CASE WHEN len(t) <= {chunk_tokens} THEN 1
              ELSE 1 + CAST(floor((len(t) - {chunk_tokens} + {stride - 1})
                                  / {stride}) AS INT) END AS nc
  FROM staged WHERE len(t) > 0
),
exploded AS (
  SELECT id, t, CAST(i AS INT) AS chunk_index
  FROM sized, unnest(range(nc)) AS u(i)
)
SELECT id, chunk_index,
       len(list_slice(t, chunk_index * {stride} + 1,
                      chunk_index * {stride} + {chunk_tokens}))::INT AS n_tokens,
       array_to_string(list_slice(t, chunk_index * {stride} + 1,
                                  chunk_index * {stride} + {chunk_tokens}),
                       ' ') AS chunk_text
FROM exploded
"""


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
) -> DataFrame:
    """Assign documents to training bins -> ``(bin, n_docs, total_tokens)``
    with ``bin`` starting at 0: document ``d`` (in ``id_col`` order) goes
    to ``floor(exclusive_prefix_token_sum(d) / budget)``.

    Scale note: the prefix sum is a single global-ordering window — at
    100 TB partition the corpus first (e.g. by date or shard) and pack
    within partitions; global packing of a corpus is inherently a
    sequential prefix sum.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    counted = df.select(
        F.col(id_col).alias("id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tok"),
    )
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    binned = counted.select(
        "id",
        "n_tok",
        (F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / budget)
        .cast("long")
        .alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
    )


def pack_sequences_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
) -> str:
    """DuckDB oracle replicating :func:`pack_sequences`."""
    return f"""
WITH counted AS (
  SELECT {id_col} AS id,
         CASE WHEN trim({text_col}) = '' THEN 0
              ELSE len(regexp_split_to_array(trim({text_col}), '\\s+')) END::BIGINT AS n_tok
  FROM {table}
),
binned AS (
  SELECT id, n_tok,
         CAST(floor(coalesce(sum(n_tok) OVER (ORDER BY id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              / {budget}) AS BIGINT) AS bin
  FROM counted
)
SELECT bin, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS total_tokens
FROM binned GROUP BY bin
"""
