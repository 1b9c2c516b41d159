"""Bucketed-table co-located join: the 100 TB join strategy where both fact
tables are pre-bucketed on the join key, so the sort-merge join reads
co-located buckets with NO shuffle exchange on either side."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    # external tables: bucket files land under tmp, not the repo warehouse
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .option("path", str(wh / "li_b")).saveAsTable("li_b"))
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .option("path", str(wh / "o_b")).saveAsTable("o_b"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    # force the shuffle-join path (at test scale Catalyst would broadcast,
    # which hides what bucketing buys on two BIG sides)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("li_b").join(
            spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: sort-merge join with ZERO Exchange operators
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and the result matches the plain (shuffling) join
    plain = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .join(
            spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert j.count() == plain


def test_bucketed_agg_has_no_shuffle(bucketed):
    spark = bucketed
    agg = spark.table("li_b").groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # grouping key = bucket key: map-side only
