import time

from pyspark.sql import functions as F

from polars_grouper_spark.sources import load_table
from polars_grouper_spark.sources.io import read_csv, write_parquet
from polars_grouper_spark.streaming.stateful import running_user_totals


def test_running_totals_batch(spark):
    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    out = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in running_user_totals(ev).collect()}
    assert sum(n for n, _ in out.values()) == ev.count()


def test_running_totals_streaming_matches_batch(spark, tmp_path):
    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    for _ in range(30):
        if not q.isActive:
            break
        time.sleep(1)
    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql("select * from running_totals").collect()
    }
    want = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
        for r in running_user_totals(ev).collect()
    }
    assert got == want


def test_partitioned_parquet_roundtrip_and_pruning(spark, tmp_path):
    orders = load_table(spark, "orders", "/root/testdata/sf0.001")
    dest = str(tmp_path / "orders_by_status")
    write_parquet(orders, dest, partition_by=["o_orderstatus"])
    back = spark.read.parquet(dest)
    assert back.count() == orders.count()
    pruned = back.where(F.col("o_orderstatus") == "F")
    import io as _io
    import contextlib

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert pruned.count() == orders.where("o_orderstatus = 'F'").count()


def test_read_csv_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = read_csv(spark, str(p), "a long, b string")
    rows = {r["a"]: r["b"] for r in df.collect()}
    assert rows == {1: "x", 2: "y"}


def test_read_json_schema(spark, tmp_path):
    from polars_grouper_spark.sources.io import read_json

    p = tmp_path / "t.jsonl"
    p.write_text('{"a": 1, "b": {"k": "x"}}\n{"a": 2, "b": {"k": "y"}}\n')
    df = read_json(spark, str(p), "a long, b struct<k: string>")
    rows = {r["a"]: r["b"]["k"] for r in df.collect()}
    assert rows == {1: "x", 2: "y"}


def test_read_parquet_roundtrip(spark, tmp_path):
    from polars_grouper_spark.sources.io import read_parquet

    nat = load_table(spark, "nation", "/root/testdata/sf0.001")
    dest = str(tmp_path / "nation_copy")
    write_parquet(nat, dest)
    back = read_parquet(spark, dest)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nat.collect()))


def test_register_views_sql_surface(spark):
    from polars_grouper_spark.sources import register_views

    register_views(spark, "/root/testdata/sf0.001")
    n = spark.sql(
        "SELECT count(*) AS n FROM orders o JOIN customer c "
        "ON o.o_custkey = c.c_custkey"
    ).collect()[0]["n"]
    assert n == spark.table("orders").count()
