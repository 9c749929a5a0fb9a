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


def test_fuzzy_ingest_probe_against_bucketed_standing_index(spark, tmp_path):
    """The production ingest path: the corpus's LSH band-bucket index and
    shingle-hash table are materialized ONCE as bucketed tables; each batch
    probes them. Must equal the derive-everything-in-query operator, and the
    bucketed index side must join WITHOUT an exchange above its scan (the
    incoming side — the small one — is the only shuffle)."""
    from kda_flink_demo_spark.operators.llm import dedup

    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    incoming = docs.filter(F.col("doc_id") >= 400).unionByName(
        docs.filter(F.col("doc_id") < 50).withColumn("doc_id", F.col("doc_id") + F.lit(10000))
    )

    buckets, hashes = dedup.build_fuzzy_ingest_index(corpus)
    write_bucketed(buckets, "lsh_index_bkt", "bucket", 8)
    write_bucketed(hashes, "lsh_hashes_bkt", "doc_id", 8)
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        probed = dedup.ingest_dedup_fuzzy_probe(
            incoming, spark.table("lsh_index_bkt"), spark.table("lsh_hashes_bkt")
        ).select("doc_id")
        inline = dedup.ingest_dedup_fuzzy(incoming, corpus).select("doc_id")
        assert {r.doc_id for r in probed.collect()} == {r.doc_id for r in inline.collect()}

        plan = probed._jdf.queryExecution().executedPlan().toString()
        lines = plan.splitlines()
        # no Exchange may sit between the bucketed index scan and its join:
        # walk up from the bucketed scan line — the nearest enclosing exchange
        # count on the index side must be zero
        idx_scans = [i for i, l in enumerate(lines) if "lsh_index_bkt" in l]
        assert idx_scans, plan
        for i in idx_scans:
            depth = len(lines[i]) - len(lines[i].lstrip())
            for j in range(i - 1, -1, -1):
                dj = len(lines[j]) - len(lines[j].lstrip())
                if dj < depth:
                    depth = dj
                    assert "Exchange hashpartitioning" not in lines[j], lines[j]
                    if "SortMergeJoin" in lines[j] or "Join" in lines[j]:
                        break
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS lsh_index_bkt")
        spark.sql("DROP TABLE IF EXISTS lsh_hashes_bkt")
