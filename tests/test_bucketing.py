"""Bucketed co-located join tests: the join plan must contain no
shuffle (Exchange) when both sides share the bucket spec."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # session-level warehouse dir is fixed at session start; tables are
    # namespaced instead
    spark.sql("CREATE DATABASE IF NOT EXISTS buckets_test")
    yield "buckets_test"
    spark.sql("DROP DATABASE IF EXISTS buckets_test CASCADE")


def test_bucketed_join_has_no_exchange(spark, lineitem, orders, warehouse):
    from dask_ms_spark.operators.bucketing import (bucketed_join,
                                                   write_bucketed)

    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "okey"),
                   f"{warehouse}.li_b", ["okey"], num_buckets=4)
    write_bucketed(orders.withColumnRenamed("o_orderkey", "okey"),
                   f"{warehouse}.ord_b", ["okey"], num_buckets=4)

    # force the sort-merge path: at real scale neither fact side
    # broadcasts, which is exactly when bucketing pays off
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, f"{warehouse}.li_b", f"{warehouse}.ord_b",
                          on="okey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and the result is the plain join's result
        want = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey).count()
        assert j.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_has_no_exchange(spark, orders, warehouse):
    from dask_ms_spark.operators.bucketing import write_bucketed

    write_bucketed(orders, f"{warehouse}.ord_agg", ["o_custkey"],
                   num_buckets=4)
    agg = (spark.table(f"{warehouse}.ord_agg")
           .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == orders.select("o_custkey").distinct().count()
