"""Sequence packing for LLM training-data pipelines.

Training pipelines concatenate tokenized documents in a fixed order and chop
the stream into fixed-size chunks (the "packed" samples fed to the trainer).
The operator therefore needs a GLOBAL running token offset per document — a
prefix sum — which naively is a single-partition window (a non-starter at
100 TB: one task sorts the world).

``pack_sequences`` computes the prefix sum scalably, the textbook two-phase
way:

1. range-partition by the ordering key (``repartitionByRange`` — Spark samples
   range boundaries, so partition i holds an ordered, disjoint id range);
2. per-partition running sums via a window PARTITIONED by the physical
   partition id (parallel, no global sort);
3. per-partition totals (one row per partition) cumsum-ed in a single tiny
   window and broadcast back as offsets.

The result is deterministic regardless of where the sampled range boundaries
land, because offset(i) + local_start only depends on the global order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 2048,
) -> DataFrame:
    """Assign each document its position in the packed token stream.

    Tokens are whitespace tokens (swap in any tokenizer-count column). Output:
    (id, n_tokens, chunk_id, chunk_offset) where ``chunk_id`` =
    global_start_offset // budget and ``chunk_offset`` = global_start_offset %
    budget — i.e. the training chunk this document starts in and where.
    """
    sc = df.sparkSession.sparkContext
    toks = df.select(
        F.col(id_col), F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens")
    )
    ranged = toks.repartitionByRange(sc.defaultParallelism, F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    local = ranged.withColumn(
        "_local_start", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0).cast("long"))
    )
    # one row per partition: the single-partition window below is over
    # ~defaultParallelism rows, not the data
    totals = local.groupBy("_pid").agg(F.sum("n_tokens").alias("_ptot"))
    w_parts = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_poff", F.coalesce(F.sum("_ptot").over(w_parts), F.lit(0).cast("long"))
    ).select("_pid", "_poff")
    start = F.col("_local_start") + F.col("_poff")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.floor(start / F.lit(budget)).cast("long").alias("chunk_id"),
            F.pmod(start, F.lit(budget)).cast("long").alias("chunk_offset"),
        )
    )
