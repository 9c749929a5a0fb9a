"""Sources: batch parquet, streaming file replay, and the Kinesis contract.

Reference source: a FlinkKinesisConsumer on stream ``kda_geojson``
(/root/reference/.../StreamJobSqlTumbling.java:41-53, README.MD:113-116). The Spark
equivalent is the spark-sql-kinesis connector (``format("kinesis")``); locally we
replay the same schema through a file stream, which exercises identical plan shapes
(source → from_json → watermark → windowed agg).

Scale note: parquet batch reads split at ``spark.sql.files.maxPartitionBytes``;
predicate pushdown and column pruning reach the scan automatically as long as
callers select/filter on the DataFrame (verified in tests via ``.explain``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

from kda_flink_demo_spark.schemas import GEOJSON_SCHEMA, TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_NANOS_COLS_CACHE: dict[str, list[str]] = {}


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark can only surface these as
    LongType (spark.sql.legacy.parquet.nanosAsLong); we convert back explicitly."""
    if path not in _NANOS_COLS_CACHE:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        _NANOS_COLS_CACHE[path] = [
            f.name for f in schema if str(f.type) == "timestamp[ns]"
        ]
    return _NANOS_COLS_CACHE[path]


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to session-local TimestampType.

    The testdata generator has shipped `ts` as parquet timestamp[ns] (round ≤3)
    and timestamp[us] without timezone (round 4+); Spark 4 surfaces the latter as
    TIMESTAMP_NTZ, which `unix_micros`, `withWatermark`, and interval joins all
    reject. The session timezone is pinned UTC (session.py), so this cast is a
    pure type relabel — wall-clock values are unchanged and window boundaries
    still match the DuckDB oracle's naive-timestamp arithmetic. Works on batch
    and streaming DataFrames alike; applied at the ingest boundary so every
    operator downstream sees one timestamp type regardless of source format.
    """
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


# Per-session cache of the LAZY table DataFrames (optimization r13, guide §4:
# shrink the Python↔JVM boundary). Every query construction re-ran
# spark.read.parquet — a driver-side footer/schema read plus a py4j exchange
# per call, ~400 calls per bench run for plans that are identical each time.
# The cached object is an unexecuted plan over an IMMUTABLE fixture file —
# no data or results are memoized, every action still computes from parquet.
# WeakKeyDictionary: entries die with their session, and a key can never
# alias a different live session.
import weakref as _weakref

_TABLE_CACHE: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Batch-load one synthetic table (one parquet file per table, TESTDATA.md).

    TIMESTAMP(NANOS) columns are truncated to microsecond TimestampType — the same
    truncation DuckDB applies — using integer division so 2^62-magnitude nanos
    don't round through a double. TIMESTAMP_NTZ columns (the round-4+ testdata
    format) are relabeled to TimestampType via normalize_timestamps.
    """
    try:
        per_session = _TABLE_CACHE.setdefault(spark, {})
    except TypeError:  # unhashable session stand-in (tests) — no cache
        per_session = None
    key = (sf_dir, name)
    if per_session is not None and key in per_session:
        return per_session[key]
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    for c in _nanos_timestamp_cols(path):
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    df = normalize_timestamps(df)
    if per_session is not None:
        per_session[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register testdata tables as temp views for the SQL surface."""
    for name in tables or TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def parse_geojson(raw: DataFrame, json_col: str = "value") -> DataFrame:
    """Bytes/string GeoJSON → typed columns (reference S2,
    /root/reference/.../StreamJobSqlTumbling.java:52 JsonNodeDeserializationSchema).

    Works identically on batch and streaming DataFrames.
    """
    return raw.select(
        F.from_json(F.col(json_col).cast("string"), GEOJSON_SCHEMA).alias("feature")
    ).select("feature.type", "feature.properties.*")


def kinesis_geojson_stream(
    spark: SparkSession,
    stream_name: str = "kda_geojson",
    region: str = "us-east-1",
    starting_position: str = "latest",
    connector_format: str = "aws-kinesis",
) -> DataFrame:
    """Production source (reference S1). Requires a Kinesis connector jar on the
    cluster — ``connector_format`` is "aws-kinesis" for the AWS-maintained
    spark-streaming-sql-kinesis connector or "kinesis" for the Qubole lineage;
    config keys mirror the reference's SourceConfigProperties
    (/root/reference/README.MD:113-116). No Kinesis endpoint exists locally,
    but the CONTRACT executes in CI: ``fake_kinesis.FakeKinesisDataSource``
    registers under the same format name, validates these exact option keys
    at load time, and drives this function end-to-end through a real
    micro-batch run (tests/test_kinesis_contract.py) — renaming an option
    here fails that test. The file-replay source below covers the downstream
    plan shapes at volume.
    """
    raw = (
        spark.readStream.format(connector_format)
        .option("kinesis.streamName", stream_name)
        .option("kinesis.region", region)
        .option("kinesis.startingPosition", starting_position)
        .load()
    )
    return parse_geojson(raw, "data")


def file_geojson_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """Local replay source: newline-delimited GeoJSON files → same typed columns."""
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )
    return parse_geojson(raw, "value")


def file_events_stream(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int = 1
) -> DataFrame:
    """Replay parquet fixture files as a stream (batch-as-oracle testing).

    NTZ timestamp columns are normalized to TimestampType so `withWatermark`
    accepts the event-time column whichever parquet flavor the fixture used.
    """
    raw = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )
    return normalize_timestamps(raw)
