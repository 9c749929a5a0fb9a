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


def _ranged_local(df: DataFrame, order_cols: list[str], value_col: str) -> DataFrame:
    """Phase 1 of the two-phase prefix sum: range-partition on the order keys
    and compute per-partition running sums. Split out so plan-shape tests can
    assert the range exchange / absence of a global sort BEFORE the
    lineage-pinning localCheckpoint hides it behind a Scan ExistingRDD."""
    sc = df.sparkSession.sparkContext
    ranged = df.repartitionByRange(
        sc.defaultParallelism, *[F.col(c) for c in order_cols]
    ).withColumn("_pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return ranged.withColumn(
        "_local_start", F.coalesce(F.sum(value_col).over(w_local), F.lit(0).cast("long"))
    )


def _global_prefix_sum(
    df: DataFrame, order_cols: list[str], value_col: str, out_col: str = "_start"
) -> DataFrame:
    """Two-phase distributed EXCLUSIVE prefix sum of ``value_col`` in the total
    order given by ``order_cols`` (which must be a total order — include a
    unique tie-break column). Adds ``out_col``; never a single global sort:
    range-partition on the order keys, per-partition windows, then a tiny
    per-partition-totals cumsum broadcast back. Deterministic regardless of
    where the sampled range boundaries land."""
    local = _ranged_local(df, order_cols, value_col)
    # ``local`` feeds TWO consumers (the per-partition totals and the final
    # join). Without pinning, each consumer materializes its OWN copy of the
    # range exchange, and RangePartitioner's boundary sampling is seeded per
    # materialization — when the sample is smaller than the data (real scale;
    # at tiny SF the sample covers every row and the bug hides) the two
    # copies pick DIFFERENT boundaries, so the totals' _pid disagrees with
    # the join's _pid and positions silently corrupt (caught by the sf0.1
    # driver-sim spot check: run-to-run nondeterministic interleave_pos).
    # A lazy localCheckpoint pins ONE RDD — one sampling, one boundary set
    # for both consumers — while keeping construction lazy; Spark reuses the
    # materialized checkpoint blocks across the consuming jobs.
    local = local.localCheckpoint(eager=False)
    # one row per partition: the single-partition window below is over
    # ~defaultParallelism rows, not the data
    totals = local.groupBy("_pid").agg(F.sum(value_col).alias("_ptot"))
    w_parts = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_poff", F.coalesce(F.sum("_ptot").over(w_parts), F.lit(0).cast("long"))
    ).select("_pid", "_poff")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_local_start") + F.col("_poff"))
        .drop("_pid", "_local_start", "_poff")
    )


def grouped_rank(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    out_col: str = "_grank",
    counts: DataFrame | None = None,
) -> DataFrame:
    """0-based rank WITHIN ``group_col`` in the total order ``order_cols``
    (which must include a unique tie-break), computed without a per-group
    window — a hot group would otherwise land in one task's sort. Shape: the
    global two-phase prefix sum of ones over (group, *order) minus a broadcast
    per-group start offset (one row per group; assumes group cardinality is
    dimension-like — languages, sources — so the offset table is tiny).

    A NULL group is a real group (matching SQL ``PARTITION BY``): the offset
    join is null-safe, so NULL-keyed rows are ranked, never dropped. Callers
    that already aggregated per-group counts from the same input pass them via
    ``counts`` (columns (group_col, _n)) to avoid a second corpus scan."""
    keyed = df.withColumn("_one", F.lit(1).cast("long"))
    pos = _global_prefix_sum(keyed, [group_col, *order_cols], "_one", out_col="_gpos")
    if counts is None:
        counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    w = Window.orderBy(group_col).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w), F.lit(0).cast("long"))
    ).select(F.col(group_col).alias("_grp"), "_off")
    return (
        pos.join(F.broadcast(offsets), F.col(group_col).eqNullSafe(F.col("_grp")))
        .withColumn(out_col, (F.col("_gpos") - F.col("_off")).cast("long"))
        .drop("_grp", "_one", "_gpos", "_off")
    )


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
    toks = df.select(
        F.col(id_col), F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens")
    )
    start = F.col("_start")
    return _global_prefix_sum(toks, [id_col], "n_tokens").select(
        F.col(id_col),
        F.col("n_tokens"),
        F.floor(start / F.lit(budget)).cast("long").alias("chunk_id"),
        F.pmod(start, F.lit(budget)).cast("long").alias("chunk_offset"),
    )


def global_shuffle_order(
    df: DataFrame, id_col: str = "doc_id", seed: str = "42"
) -> DataFrame:
    """Deterministic global training order: every document gets a stable
    position in a pseudo-random permutation of the corpus.

    Training runs need the corpus in a shuffled-but-REPRODUCIBLE order (same
    order on every rerun, engine, and cluster size — ``rand()`` is none of
    those). The sort key is the first 15 hex digits of ``md5(seed || ':' ||
    id)`` (engine-portable, 60 bits → collision-free in practice; ties broken
    on the id for full determinism). The position is the two-phase prefix sum
    of 1 in that order — range partition on the hash key, never a
    single-partition row_number window. Output: (id, shuffle_pos).
    """
    keyed = df.select(
        F.col(id_col),
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))), 1, 15),
            16,
            10,
        )
        .cast("long")
        .alias("_hkey"),
        F.lit(1).cast("long").alias("_one"),
    )
    return _global_prefix_sum(keyed, ["_hkey", id_col], "_one", out_col="shuffle_pos").select(
        F.col(id_col), F.col("shuffle_pos")
    )


def assign_shards(
    df: DataFrame,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-balanced output sharding: lay documents (in id order) on the
    global token line and cut it into ``n_shards`` equal-token spans —
    ``shard = (start · n) DIV total`` clamped to the last shard. The write-side
    layout planner for training corpora: every shard carries the same token
    mass to within one document, so no trainer reads a fat shard while others
    starve.

    Entirely integer arithmetic (BIGINT multiply + integer division — no float
    path to drift between engines), on the same two-phase distributed prefix
    sum as ``pack_sequences``; the corpus total is a one-row aggregate
    broadcast back. Output: (id, n_tokens, shard).
    """
    toks = df.select(
        F.col(id_col), F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens")
    )
    laid = _global_prefix_sum(toks, [id_col], "n_tokens")
    total = toks.agg(F.sum("n_tokens").cast("long").alias("_total"))
    return (
        laid.crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.least(
                F.expr(f"CAST((_start * {int(n_shards)}) DIV _total AS BIGINT)"),
                F.lit(int(n_shards) - 1).cast("long"),
            ).alias("shard"),
        )
    )


def assign_shards_oracle_sql(n_shards: int = 8, table: str = "documents") -> str:
    """DuckDB twin: ordered window sum + integer division."""
    return f"""
    WITH t AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM {table}
    ),
    s AS (
        SELECT doc_id, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS start,
               CAST(sum(n_tokens) OVER () AS BIGINT) AS total
        FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(least((start * {int(n_shards)}) // total, {int(n_shards) - 1}) AS BIGINT)
               AS shard
    FROM s
    """
