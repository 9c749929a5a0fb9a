"""Ingest-boundary format-proofing: the driver's testdata generator has shipped
``ts`` as parquet timestamp[ns] (rounds ≤3) and as timestamp[us] without a
timezone (round 4+ → Spark 4 surfaces TIMESTAMP_NTZ). ``load_table`` /
``normalize_timestamps`` must present plain TimestampType with identical
wall-clock values for EVERY flavor — ``unix_micros``, ``withWatermark``, and
interval joins all reject NTZ, so one unnormalized column breaks the W5
operator, the streaming tests, and the bench at once (that was round 4's
regression)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from kda_flink_demo_spark.io.sources import load_table, normalize_timestamps

TS_VALUES = [
    dt.datetime(2024, 1, 1, 0, 0, 0, 123456),
    dt.datetime(2024, 6, 15, 23, 59, 59, 999999),
    dt.datetime(2025, 12, 31, 12, 30, 0, 1),
]


@pytest.mark.parametrize(
    "arrow_type",
    [
        pa.timestamp("us"),  # round-4+ driver format → Spark reads TIMESTAMP_NTZ
        pa.timestamp("us", tz="UTC"),  # classic instant format → TimestampType
        pa.timestamp("ns"),  # round-≤3 driver format → nanosAsLong path
    ],
    ids=["ntz_us", "ltz_us", "nanos"],
)
def test_load_table_normalizes_every_parquet_timestamp_flavor(spark, tmp_path, arrow_type):
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(TS_VALUES, arrow_type),
        }
    )
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    pq.write_table(table, str(sf_dir / "events.parquet"))

    df = load_table(spark, str(sf_dir), "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), df.schema["ts"].dataType
    # values are the same wall-clock instants (session tz pinned UTC)
    got = {r.event_id: r.ts for r in df.collect()}
    assert got == {i + 1: v for i, v in enumerate(TS_VALUES)}
    # the round-4 regression trigger: unix_micros must analyze and compute
    micros = {r.event_id: r.m for r in df.select("event_id", F.unix_micros("ts").alias("m")).collect()}
    epoch = dt.datetime(1970, 1, 1)
    assert micros == {
        i + 1: int((v - epoch).total_seconds() * 1_000_000) for i, v in enumerate(TS_VALUES)
    }


def test_normalize_timestamps_streaming_watermark_accepts_ntz_source(spark, tmp_path):
    """``withWatermark`` rejects NTZ event-time columns; the file replay source
    must normalize before the caller attaches a watermark."""
    from kda_flink_demo_spark.io.sources import file_events_stream

    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(TS_VALUES, pa.timestamp("us")),
        }
    )
    src = tmp_path / "stream"
    src.mkdir()
    pq.write_table(table, str(src / "part-0.parquet"))

    raw_schema = spark.read.parquet(str(src)).schema  # NTZ as the driver wrote it
    stream = file_events_stream(spark, str(src), raw_schema)
    assert isinstance(stream.schema["ts"].dataType, TimestampType)
    # attaching the watermark is exactly what failed in round 4
    wm = stream.withWatermark("ts", "0 seconds")
    assert wm.isStreaming


def test_normalize_timestamps_is_identity_on_plain_timestamps(spark):
    df = spark.createDataFrame([(1, dt.datetime(2024, 1, 1))], "id long, ts timestamp")
    assert normalize_timestamps(df) is df or normalize_timestamps(df).schema == df.schema
