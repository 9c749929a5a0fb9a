"""Streaming jobs mirroring the reference's six Flink applications.

Reference jobs (SURVEY §2.11, Starter.java:31-42 dispatch):
  StreamJobSqlTumbling / StreamJobTumbling  → tumbling windowed count (W1/W2 —
      one Spark implementation serves the SQL and Table API spellings)
  StreamJobTumblingOffset                   → tumbling with boundary offset (W3)
  StreamJobSqlHopping                       → hopping window + HOP_ROWTIME (W4)
  StreamJobSqlSliding / StreamJobSingle     → per-event trailing-interval count (W5)

Each job builder takes an already-parsed event stream (railway_class, rowtime) —
from the Kinesis source in production or a file replay locally (io.sources) —
applies a 0-second watermark (the reference's punctuated max-event-time
watermark, T2; micro-batch granularity divergence documented in SURVEY §2.3),
and returns an append-mode DataFrame matching the reference's sink contract.
``run_to_sink`` wires any of them into the idempotent upsert sink with a
checkpoint location — the whole O5 write-ahead machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kda_flink_demo_spark.operators.windows import hopping_counts, tumbling_counts
from kda_flink_demo_spark.streaming.sliding_state import sliding_range_count_stream
from kda_flink_demo_spark.streaming.upsert import DuckDBUpsertSink

WATERMARK = "0 seconds"  # zero allowed lateness, per the reference's assigner

ROCKSDB_PROVIDER = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def use_rocksdb_state(spark) -> None:
    """Switch streaming state to the RocksDB provider — the at-scale choice
    (state spills to local disk instead of living on the JVM heap; changelog
    checkpointing keeps commits incremental). Flink-side equivalent is the
    RocksDB state backend the reference would configure in production. Must be
    set before the streaming query starts."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)

TUMBLING_SINK_SCHEMA = (
    "railway_class VARCHAR, railway_class_count BIGINT, "
    "window_start TIMESTAMP, window_end TIMESTAMP"
)
TUMBLING_SINK_KEYS = ["railway_class", "window_start", "window_end"]

SLIDING_SINK_SCHEMA = (
    "event_id BIGINT, railway_class VARCHAR, rowtime TIMESTAMP, railway_class_count BIGINT"
)
SLIDING_SINK_KEYS = ["event_id", "railway_class", "rowtime"]


def job_tumbling(events: DataFrame, size: str = "1 minute") -> DataFrame:
    """StreamJobSqlTumbling / StreamJobTumbling (one Catalyst plan for both)."""
    return tumbling_counts(events.withWatermark("rowtime", WATERMARK), size=size)


def job_tumbling_offset(
    events: DataFrame, size: str = "1 minute", offset: str = "30 seconds"
) -> DataFrame:
    """StreamJobTumblingOffset: TumblingEventTimeWindows.of(size, offset) ≡
    window(..., startTime=offset)."""
    return tumbling_counts(events.withWatermark("rowtime", WATERMARK), size=size, offset=offset)


def job_hopping(events: DataFrame, size: str = "2 minutes", slide: str = "1 minute") -> DataFrame:
    """StreamJobSqlHopping with a real (non-degenerate) slide + HOP_ROWTIME."""
    return hopping_counts(events.withWatermark("rowtime", WATERMARK), size=size, slide=slide)


def job_sliding(events: DataFrame, preceding_seconds: int = 30 * 60) -> DataFrame:
    """StreamJobSqlSliding / StreamJobSingle: custom stateful trailing count."""
    return sliding_range_count_stream(events, preceding_seconds=preceding_seconds)


JOB_REGISTRY = {
    "StreamJobSqlTumbling": job_tumbling,
    "StreamJobTumbling": job_tumbling,
    "StreamJobTumblingOffset": job_tumbling_offset,
    "StreamJobSqlHopping": job_hopping,
    "StreamJobSqlSliding": job_sliding,
    "StreamJobSingle": job_sliding,
}


def dispatch(job_class_name: str):
    """Single-job dispatch replicating the reference Starter's *intent* — without
    its missing-break fall-through bug (Starter.java:31-42, SURVEY §7.3)."""
    try:
        return JOB_REGISTRY[job_class_name]
    except KeyError:
        raise KeyError(
            f"unknown JOB_CLASS_NAME {job_class_name!r}; known: {sorted(set(JOB_REGISTRY))}"
        ) from None


def run_to_sink(
    result: DataFrame,
    sink: DuckDBUpsertSink,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the streaming query into the idempotent upsert sink with a
    checkpoint — Spark replays failed batches under the same batchId, the keyed
    upsert absorbs the replay (the reference's 244-line checkpoint-coordinated
    WAL sink, SinkDataApiTumbling.java:30-273, in one call)."""
    writer = (
        result.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
