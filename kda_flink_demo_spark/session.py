"""SparkSession factory with defaults chosen for very large scale.

The reference (Flink 1.6 on KDA) tunes checkpoint interval and sink batch size
(/root/reference/README.MD:122-127). The Spark-side equivalents are session-level:
AQE for runtime re-planning (skew joins, partition coalescing), Arrow for any
Python-side exchange, and an explicit UTC session timezone so event-time window
boundaries are deterministic regardless of host timezone.

At 100 TB these defaults matter:
- ``spark.sql.adaptive.enabled``: runtime shuffle-partition coalescing + skew-join
  splitting — replaces hand-tuned ``spark.sql.shuffle.partitions`` per query.
- ``spark.sql.files.maxPartitionBytes`` 128m: one task per ~128 MB parquet split →
  ~800k tasks over 100 TB, a healthy task count for a 1000-executor cluster.
- ``autoBroadcastJoinThreshold`` 64m: dimension tables (region/nation/customer at
  TPC-H-ish shape) broadcast instead of shuffling the 100 TB fact side.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import SparkSession

ENGINE_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    # static conf (ignored by apply_engine_conf on a live session): keep managed
    # tables (bucketed-join tests) out of the repo working directory
    "spark.sql.warehouse.dir": "/tmp/kda-spark-warehouse",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": "67108864",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.parquet.filterPushdown": "true",
    # Spark (through 4.x) cannot read parquet TIMESTAMP(NANOS) as TimestampType;
    # this legacy conf surfaces nanos as LongType and io.sources.load_table
    # converts them back to microsecond timestamps explicitly.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # NOTE: parquet aggregate pushdown is deliberately OFF — its footer schema
    # conversion rejects TIMESTAMP(NANOS) columns (our testdata's `ts`), and it
    # only helps bare min/max/count-over-scan queries.
}

# Conf keys that are runtime-settable on an existing session (everything in
# ENGINE_CONF is; static confs like spark.master are not in that dict).
_RUNTIME_SETTABLE = set(ENGINE_CONF)


def get_spark(app_name: str = "kda-flink-demo-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a local SparkSession with engine defaults applied.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores. On a real cluster the
    master/executor topology comes from spark-submit; this factory only supplies
    SQL-level conf.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return spark


# Sessions (by JVM session hash) that already received the full ENGINE_CONF.
# apply_engine_conf is called once per QUERY construction (the registry
# wrapper), which at bench scale meant ~4,400 py4j conf.set round-trips per
# run for values that never change after the first call — measurable pure
# driver-side overhead (optimization r13, guide §4: shrink the Python↔JVM
# boundary). After the first full application we only re-verify the one
# correctness-critical conf (the UTC session timezone — window boundaries
# must match the DuckDB oracle) with a single conf.get; if an external owner
# reset it, the full set is re-applied. A WeakSet keyed on the Python session
# object cannot alias a different live session (no id() reuse); a caller that
# re-wraps the same JVM session in a fresh Python object merely re-applies —
# the pre-r13 behavior.
_CONF_APPLIED: "weakref.WeakSet" = weakref.WeakSet()


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine conf to an externally provided session.

    Used by ``__spark_entry__`` because the verification driver owns the session.
    The critical one is the UTC session timezone: window boundaries must match the
    DuckDB oracle's naive-timestamp arithmetic.
    """
    try:
        seen = spark in _CONF_APPLIED
    except TypeError:
        seen = False
    if seen:
        # Single-canary assumption (ADVICE r13, stated explicitly): after the
        # first full application, ONLY the UTC session timezone is re-verified
        # per call. It is the one ENGINE_CONF runtime conf whose silent loss
        # flips query RESULTS vs the oracle (window boundaries); the others
        # are perf-shaping (AQE/broadcast/shuffle sizing — a slow query, not a
        # wrong one) or fail LOUDLY when lost (nanosAsLong: the events scan
        # throws PARQUET_TYPE_ILLEGAL, never returns wrong rows). An external
        # owner resetting a non-canary conf between calls therefore cannot
        # corrupt results; it is re-applied on the next fresh-session wrap.
        try:
            if spark.conf.get("spark.sql.session.timeZone", "") == "UTC":
                return spark
        except Exception:
            pass  # fall through to a full re-apply
    for k in _RUNTIME_SETTABLE:
        try:
            spark.conf.set(k, ENGINE_CONF[k])
        except Exception:
            pass  # static conf on this build — keep going
    try:
        _CONF_APPLIED.add(spark)
    except TypeError:
        pass
    return spark
