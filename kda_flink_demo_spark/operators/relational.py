"""Relational breadth: joins, sorts, limits, set operations (reference §2.7).

The reference has none of these (verified in SURVEY §2.7) — they come free from
Catalyst. This module exercises them with deliberate physical strategy choices so
the engine demonstrably picks the right plan at scale:

- dimension joins use explicit ``broadcast()`` — at 100 TB the fact side never
  shuffles for a dim join;
- the orders⋈lineitem fact-fact join is a shuffled hash/sort-merge join on the
  natural key, AQE-skew-handled;
- top-k is ``orderBy().limit()`` which Spark executes as TakeOrderedAndProject —
  a per-partition heap + driver merge, never a full sort at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from kda_flink_demo_spark.functions import det_round


def revenue_by_region(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q5-shaped star join: fact⋈fact shuffled, all dims broadcast."""
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            det_round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-anti join (NOT EXISTS). Broadcast-able when the subquery side is small;
    at scale Spark picks shuffled left-anti hash join automatically."""
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


def customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-semi join (EXISTS)."""
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


def top_customers_by_revenue(customer: DataFrame, orders: DataFrame, k: int = 10) -> DataFrame:
    """Top-k via TakeOrderedAndProject; ties broken on the key so results are
    deterministic across engines (FIXTURES.md §4)."""
    return (
        orders.groupBy("o_custkey")
        .agg(det_round(F.sum("o_totalprice"), 2).alias("revenue"))
        .join(broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_custkey"), F.col("c_name"), F.col("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(k)
    )


def nation_set_ops(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over nation-key sets, tagged by op."""
    c = customer.select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = supplier.select(F.col("s_nationkey").alias("nationkey")).distinct()
    return (
        c.union(s).distinct().withColumn("op", F.lit("union"))
        .unionByName(c.intersect(s).withColumn("op", F.lit("intersect")))
        .unionByName(c.exceptAll(s.intersect(c)).distinct().withColumn("op", F.lit("except")))
    )


def rank_parts_in_brand(part: DataFrame, k: int = 3) -> DataFrame:
    """Analytic row_number per group (top-k per key) — single shuffle on the
    partition key, per-partition sort. Deterministic ordering via (price desc, key).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        # cast: DuckDB row_number() is BIGINT, Spark's is int — align schemas
        part.withColumn("price_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("price_rank") <= k)
        .select("p_brand", "p_partkey", "p_retailprice", "price_rank")
    )
