"""The reference expresses the same computation three ways — Flink SQL, Table
API, DataStream API (SURVEY §3). Spark-side, the SQL spelling and the DataFrame
spelling must produce identical results (they share one Catalyst plan); these
tests pin that, plus partition-count invariance (no accidental order
dependence in any operator's results)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kda_flink_demo_spark.io.sources import load_table, register_views
from kda_flink_demo_spark.operators.windows import tumbling_counts
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sql_and_dataframe_spellings_agree(spark):
    """W1 (SQL) ≡ W2 (fluent API): the reference's flagship SQL, spelled in
    Spark SQL with window(), equals the DataFrame builder row-for-row."""
    register_views(spark, SF_DIR, ["events"])
    sql_df = spark.sql(
        """
        SELECT event_type AS railway_class,
               count(*) AS railway_class_count,
               window.start AS window_start,
               window.end AS window_end
        FROM events
        GROUP BY window(ts, '1 minute'), event_type
        """
    )
    api_df = tumbling_counts(
        load_table(spark, SF_DIR, "events").select(
            F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
        )
    ).select("railway_class", "railway_class_count", "window_start", "window_end")
    assert _rows(sql_df) == _rows(api_df)


def test_results_invariant_to_partitioning(spark):
    """Distributed-correctness property: results must not depend on the number
    of input partitions (catches order-dependent folds/aggregations)."""
    from kda_flink_demo_spark.operators.llm import dedup, text

    docs = load_table(spark, SF_DIR, "documents")
    for build in [
        lambda d: dedup.minhash_lsh_pairs(d, threshold=0.8),
        lambda d: text.doc_fingerprint(d),
        lambda d: dedup.simhash_values(d),
    ]:
        one = _rows(build(docs.repartition(1)))
        many = _rows(build(docs.repartition(17)))
        assert one == many
