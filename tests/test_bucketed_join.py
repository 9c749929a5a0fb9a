"""Bucketed-table co-located join: the write-once-shuffle-never layout. Both
fact tables bucketed on the join key with equal bucket counts must sort-merge
join with no Exchange in the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from kda_flink_demo_spark.io.sinks import write_bucketed
from kda_flink_demo_spark.io.sources import load_table
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        orders = load_table(spark, SF_DIR, "orders")
        lineitem = load_table(spark, SF_DIR, "lineitem")
        write_bucketed(orders, "orders_bkt", "o_orderkey", 8)
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_bkt", "o_orderkey", 8
        )
        joined = spark.table("lineitem_bkt").join(spark.table("orders_bkt"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        # sanity: result matches the plain join
        expected = lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
