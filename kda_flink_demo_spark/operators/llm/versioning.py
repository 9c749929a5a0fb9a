"""Corpus snapshot versioning: diff two snapshots of a document table.

Training corpora are rebuilt on a cadence (re-crawls, license removals, new
sources); the pipeline needs to know WHAT changed between snapshot A and
snapshot B — which documents were added, removed, or edited — to do
incremental re-tokenization / re-embedding instead of reprocessing 100 TB.

Scale shape: both snapshots are projected to (id, xxhash64(text)) BEFORE the
join, so the full-outer join shuffles two 16-byte-per-doc key tables — never
document text. Unchanged documents (the overwhelming majority of a snapshot
pair) are filtered out after the join so the diff output is proportional to
the churn, not the corpus. The oracle compares text equality directly; the
engine compares 8-byte hashes (a collision would need ~2^32 colliding docs
per Birthday bound — negligible at any real corpus size and impossible at
test scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, status) for every document that differs between two snapshots:
    ``added`` (only in new), ``removed`` (only in old), ``changed`` (same id,
    different text). Unchanged ids are dropped."""
    o = old_df.select(
        F.col(id_col).alias("_id"), F.xxhash64(F.col(text_col)).alias("_ho")
    )
    n = new_df.select(
        F.col(id_col).alias("_id"), F.xxhash64(F.col(text_col)).alias("_hn")
    )
    joined = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") != F.col("_hn"), F.lit("changed"))
    )
    return (
        joined.select(F.col("_id").alias(id_col), status.alias("status"))
        .filter(F.col("status").isNotNull())
    )


def snapshot_diff_oracle_sql(
    old_sql: str, new_sql: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin comparing text directly (no hashing needed oracle-side).
    IS DISTINCT FROM, not ``<>``: Spark's xxhash64 maps a NULL text to a
    constant, so NULL-vs-text compares as changed and NULL-vs-NULL as
    unchanged — exactly null-safe inequality semantics; a plain ``<>`` would
    silently classify NULL-vs-text rows as unchanged."""
    return f"""
    WITH old_snap AS ({old_sql}), new_snap AS ({new_sql})
    SELECT coalesce(o.{id_col}, n.{id_col}) AS {id_col},
           CASE WHEN o.{id_col} IS NULL THEN 'added'
                WHEN n.{id_col} IS NULL THEN 'removed'
                WHEN o.{text_col} IS DISTINCT FROM n.{text_col} THEN 'changed'
           END AS status
    FROM old_snap o FULL OUTER JOIN new_snap n ON o.{id_col} = n.{id_col}
    WHERE CASE WHEN o.{id_col} IS NULL THEN 'added'
               WHEN n.{id_col} IS NULL THEN 'removed'
               WHEN o.{text_col} IS DISTINCT FROM n.{text_col} THEN 'changed'
          END IS NOT NULL
    """
