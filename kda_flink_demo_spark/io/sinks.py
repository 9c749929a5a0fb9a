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


def zorder_value(x, y, bits: int = 10):
    """Morton (Z-order) interleave of two non-negative integer columns: bit i
    of ``x`` lands at output bit 2i, bit i of ``y`` at 2i+1. Pure JVM bit
    arithmetic (the bit fields are disjoint, so the sum IS the interleave —
    no overflow below 32 interleaved bits)."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_value_sql(x: str, y: str, bits: int = 10) -> str:
    """DuckDB twin of :func:`zorder_value` (unrolled shifts and masks)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    x_col,
    y_col,
    bits: int = 10,
    shard_bits: int = 4,
):
    """Z-order (Morton-curve) output layout: quantize both dimensions to
    ``bits`` bits by an order-preserving min/max linear map, interleave, and
    assign each row a shard by the TOP ``shard_bits`` z bits — the
    Delta/Iceberg ``OPTIMIZE ZORDER BY`` idea as one tiny bounds aggregate
    (broadcast) plus a map-only projection.

    The quantization is what makes the interleave meaningful on real data:
    raw columns rarely fill their bit range (a 10-value dimension leaves the
    top interleaved bits constant and the curve degenerates to a single
    shard). ``floor((v − min) · 2^bits / (max − min + 1))`` is exact
    IEEE-double arithmetic well under 2^53, so both engines produce the
    identical cell — production systems use sampled per-column range ids for
    the same purpose; min/max keeps it deterministic with no sampling pass.

    Why it matters at 100 TB: writing files in z order makes EVERY
    interleaved dimension's per-file min/max span narrow (≈ range /
    2^(shard_bits/2) instead of the full range under single-column or
    insertion order), so footer stats prune scans for predicates on EITHER
    column. The locality claim is asserted quantitatively in
    tests/test_round5_ops.py (z-order shard spans vs insertion-order spans).
    """
    from pyspark.sql import functions as F

    bounds = df.agg(
        F.min(x_col).alias("_xmin"),
        F.max(x_col).alias("_xmax"),
        F.min(y_col).alias("_ymin"),
        F.max(y_col).alias("_ymax"),
    )
    cells = float(1 << bits)

    def quant(v, lo, hi):
        return F.floor((v - lo) * F.lit(cells) / (hi - lo + 1)).cast("long")

    d = df.crossJoin(F.broadcast(bounds))
    z = zorder_value(
        quant(x_col, F.col("_xmin"), F.col("_xmax")),
        quant(y_col, F.col("_ymin"), F.col("_ymax")),
        bits=bits,
    )
    return d.select(
        *df.columns,
        z.alias("zvalue"),
        F.shiftright(z, 2 * bits - shard_bits).alias("shard"),
    )
