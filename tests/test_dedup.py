from polars_grouper_spark.functions import dedup as dd


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, near),  # near dup of 0
        (3, "completely different content about spark dataframes and shuffles"),
        (4, "short text"),
    ]
    return spark.createDataFrame(rows, schema="doc_id long, text string").coalesce(1)


def test_exact_dedup(spark):
    out = {r["doc_id"]: r for r in dd.exact_dedup(_docs(spark)).collect()}
    assert out[0]["canonical_id"] == 0 and not out[0]["is_duplicate"]
    assert out[1]["canonical_id"] == 0 and out[1]["is_duplicate"]
    assert out[1]["group_size"] == 2
    assert out[3]["group_size"] == 1


def test_ngram_jaccard_pairs(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_minhash_lsh_finds_dups(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dd.minhash_lsh_pairs(_docs(spark), threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs  # near dup caught by banding
    assert (0, 3) not in pairs


def test_simhash_near_dup(spark):
    hashes = {r["id"]: r["simhash"] for r in dd.simhash(_docs(spark)).collect()}
    assert hashes[0] == hashes[1]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dd.simhash_pairs(_docs(spark), max_hamming=10).collect()
    }
    assert pairs[(0, 1)] == 0
    assert 0 < pairs[(0, 2)] <= 10


def test_simhash_portable_matches_duckdb(spark):
    """The portable (md5-based) simhash must be reproducible in DuckDB."""
    import duckdb

    df = _docs(spark)
    got = {r["id"]: r["simhash"] for r in dd.simhash(df, bits=16).collect()}
    rows = df.collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", [(r["doc_id"], r["text"]) for r in rows])
    duck = dict(
        con.sql(
            """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM docs WHERE trim(text) <> ''
), tw AS (
  SELECT doc_id, tok, count(*)::bigint w FROM tok GROUP BY doc_id, tok
), th AS (
  SELECT doc_id, w, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) h FROM tw
), bits AS (
  SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN w ELSE -w END) s
  FROM th, range(16) r(b) GROUP BY doc_id, b
)
SELECT doc_id, sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::bigint
FROM bits GROUP BY doc_id
"""
        ).fetchall()
    )
    for k, v in duck.items():
        assert got[k] == v, (k, got[k], v)
