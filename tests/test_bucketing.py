from pyspark.sql import functions as F

from polars_grouper_spark.plans.bucketing import bucket_table, co_bucketed_join, exchange_count
from polars_grouper_spark.sources import load_table


def test_co_bucketed_join_elides_shuffle(spark):
    li = load_table(spark, "lineitem", "/root/testdata/sf0.001")
    edges = li.select(F.col("l_suppkey").alias("key"), F.col("l_partkey").alias("dst"))
    ranks = li.select(F.col("l_suppkey").alias("key")).distinct().withColumn(
        "score", F.lit(1.0)
    )

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = edges.join(ranks, "key")
        plain_ex = exchange_count(plain)

        bucket_table(edges, "b_edges", "key", n_buckets=8)
        bucket_table(ranks, "b_ranks", "key", n_buckets=8)
        bucketed = co_bucketed_join(spark, "b_edges", "b_ranks", "key")
        bucketed_ex = exchange_count(bucketed)

        # same results
        assert bucketed.count() == plain.count()
        # the bucketed join needs no shuffle at all; the plain one shuffles
        # both sides
        assert plain_ex >= 2
        assert bucketed_ex == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS b_edges")
        spark.sql("DROP TABLE IF EXISTS b_ranks")
