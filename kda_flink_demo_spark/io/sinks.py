"""Batch sinks: partitioned parquet layout and bucketed tables for co-located
joins.

Scale notes (the 100 TB layout playbook):
- ``write_partitioned``: hive-partitioned parquet (e.g. by date) gives partition
  pruning on the read side — a date-filtered query scans only matching
  directories. Keep partition cardinality moderate (10³–10⁵ dirs).
- ``write_bucketed``: pre-shuffled, co-located storage on a join key. Two tables
  bucketed on the same key with the same bucket count sort-merge-join with ZERO
  exchange at query time — the shuffle is paid once at write time. This is the
  Spark-native equivalent of a co-partitioned warehouse layout (asserted in
  tests/test_bucketed_join.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(df: DataFrame, path: str, *partition_cols: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)
