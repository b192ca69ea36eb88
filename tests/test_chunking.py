"""Document chunking and sequence packing — window arithmetic, overlap,
edge cases, DuckDB parity."""

import duckdb
import pytest

from polars_grouper_spark.functions.chunking import (
    chunk_documents,
    chunk_documents_sql,
    pack_sequences,
    pack_sequences_sql,
)


def rows(df, *cols):
    return sorted(tuple(r) for r in (df.select(*cols) if cols else df).collect())


def make_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def duck_view(texts):
    con = duckdb.connect()
    vals = ",".join(f"({i}, '{t}')" for i, t in enumerate(texts))
    con.sql(f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) t(doc_id, text)")
    return con


def test_chunk_exact_windows(spark):
    docs = make_docs(spark, ["a b c d e f"])
    got = rows(chunk_documents(docs, chunk_tokens=3, overlap=0))
    assert got == [
        (0, 0, 3, "a b c"),
        (0, 1, 3, "d e f"),
    ]


def test_chunk_short_tail_and_overlap(spark):
    docs = make_docs(spark, ["t1 t2 t3 t4 t5"])
    got = rows(chunk_documents(docs, chunk_tokens=3, overlap=1))
    # stride 2: ceil((5-3)/2)=1 extra window -> starts 1 and 3; the second
    # window already covers through t5, so no ragged third chunk.
    assert got == [
        (0, 0, 3, "t1 t2 t3"),
        (0, 1, 3, "t3 t4 t5"),
    ]
    ragged = rows(chunk_documents(make_docs(spark, ["t1 t2 t3 t4"]),
                                  chunk_tokens=3, overlap=1))
    assert ragged == [(0, 0, 3, "t1 t2 t3"), (0, 1, 2, "t3 t4")]


def test_chunk_doc_shorter_than_window(spark):
    docs = make_docs(spark, ["only two", ""])
    got = rows(chunk_documents(docs, chunk_tokens=10))
    assert got == [(0, 0, 2, "only two")]  # empty doc yields nothing


def test_chunk_validation(spark):
    docs = make_docs(spark, ["x"])
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(docs, chunk_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=3, overlap=3)


def test_chunk_duckdb_parity(spark):
    texts = [
        " ".join(f"w{j}" for j in range(n)) for n in (0, 1, 5, 12, 40, 41)
    ]
    docs = make_docs(spark, texts)
    got = rows(chunk_documents(docs, chunk_tokens=7, overlap=2))
    con = duck_view(texts)
    want = sorted(
        tuple(r)
        for r in con.sql(
            chunk_documents_sql(chunk_tokens=7, overlap=2)
        ).fetchall()
    )
    assert got == want


def test_pack_contiguous_bins(spark):
    # doc lengths: 3, 3, 3, 3 with budget 6 -> bins {0,0,1,1}
    docs = make_docs(spark, ["a b c", "d e f", "g h i", "j k l"])
    got = rows(pack_sequences(docs, budget=6))
    assert got == [(0, 2, 6), (1, 2, 6)]


def test_pack_oversized_doc_own_bin(spark):
    docs = make_docs(spark, ["a b c d e f g h", "x", "y"])
    got = rows(pack_sequences(docs, budget=4))
    # doc0 (8 tok) starts at cum 0 -> bin 0 (overflows it);
    # doc1 starts at cum 8 -> bin 2; doc2 at cum 9 -> bin 2.
    assert got == [(0, 1, 8), (2, 2, 2)]


def test_pack_duckdb_parity(spark):
    texts = [" ".join(f"w{j}" for j in range(3 + (7 * i) % 11)) for i in range(20)]
    docs = make_docs(spark, texts)
    got = rows(pack_sequences(docs, budget=16))
    con = duck_view(texts)
    want = sorted(
        tuple(r) for r in con.sql(pack_sequences_sql(budget=16)).fetchall()
    )
    assert got == want
