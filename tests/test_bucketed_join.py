"""Bucketing tier: co-located joins via bucketBy — the pre-shuffle-once,
join-many-times strategy for the 100 TB fact tables (SURVEY.md §4.2 /
task brief 'bucketing for co-located joins')."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
import pytest

from .conftest import SF_DIR


@pytest.fixture()
def warehouse(spark):
    yield
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("b_orders"))
    (lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").saveAsTable("b_lineitem"))

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("b_lineitem")
            .join(spark.table("b_orders"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(j)
        # the join itself must be shuffle-free: both sides pre-bucketed on
        # the key, so only the final tiny aggregation exchanges
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part, join_part

        # and the answer matches the plain (shuffling) join
        plain = (
            lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
