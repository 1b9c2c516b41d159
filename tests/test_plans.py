"""Plan-shape regression tests: the scale properties (predicate pushdown,
column pruning, broadcast joins) must survive refactors — a correct slow plan
is a failure at 100 TB."""

import pytest


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def sf001(sf_dir):
    return sf_dir  # sf0.001


def test_pricing_summary_pushdown_and_pruning(spark, sf001):
    from etl_processes_spark.ops.relational import pricing_summary

    li = spark.read.parquet(f"{sf001}/lineitem.parquet")
    plan = _plan(pricing_summary(li))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # column pruning: partkey/suppkey/orderkey must not be read
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema


def test_revenue_by_nation_broadcasts_dims(spark, sf001):
    from etl_processes_spark.ops.relational import revenue_by_nation

    t = lambda n: spark.read.parquet(f"{sf001}/{n}.parquet")
    plan = _plan(
        revenue_by_nation(t("region"), t("nation"), t("customer"), t("orders"), t("lineitem"))
    )
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_numeric_profile_single_column_scan(spark, sf001):
    from etl_processes_spark.profile import numeric_profile_df

    li = spark.read.parquet(f"{sf001}/lineitem.parquet")
    plan = _plan(numeric_profile_df(li, "l_extendedprice"))
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "l_extendedprice" in read_schema
    assert "l_orderkey" not in read_schema


def test_cosine_topk_broadcasts_queries(spark):
    from pyspark.sql import functions as F, types as T

    from etl_processes_spark.ops.similarity import cosine_topk

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame([(i, [float(i), 1.0]) for i in range(50)], schema)
    plan = _plan(cosine_topk(df, df.filter("vec_id < 3"), k=2))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
