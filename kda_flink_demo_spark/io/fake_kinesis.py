"""A registerable test double for the ``aws-kinesis`` streaming connector.

The production source (``sources.kinesis_geojson_stream``) targets the
AWS-maintained spark-streaming-sql-kinesis connector, which needs a JVM jar
and a reachable Kinesis endpoint — neither exists in a test sandbox. This
module pins the CONTRACT instead, via Spark 4's Python DataSource API: a
``FakeKinesisDataSource`` registered under the same format name receives
exactly the options the production reader emits, REFUSES to load unless the
pinned option names are present, and serves records in the connector's
schema (``data`` binary + stream metadata columns) through a real
micro-batch plan — so readStream.format("aws-kinesis") → ``parse_geojson``
→ typed columns executes end-to-end in CI.

Reference config surface: SourceConfigProperties in
/root/reference/.../StreamJobSqlTumbling.java:44-53 (stream name, region,
initial position) — the same three knobs the Spark connector spells
``kinesis.streamName`` / ``kinesis.region`` / ``kinesis.startingPosition``.

Usage::

    spark.dataSource.register(FakeKinesisDataSource)
    df = sources.kinesis_geojson_stream(spark)   # production code, unchanged

The fake serves ``N_FAKE_RECORDS`` deterministic GeoJSON Feature records
shaped like the reference's generator (/root/reference/send.py:8-22) as a
pure function of the record index — the DataSource instance is re-created
inside Spark's data-source worker from the pickled class, so any payload
state set driver-side would not survive; a closed-form generator does.
"""

from __future__ import annotations

import datetime
import json

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

# DataSourceOptions lower-cases keys before they reach the Python source
REQUIRED_OPTIONS = ("kinesis.streamname", "kinesis.region", "kinesis.startingposition")

# the connector's record schema: payload bytes + per-record stream metadata
KINESIS_RECORD_SCHEMA = (
    "data binary, streamName string, partitionKey string, "
    "sequenceNumber string, approximateArrivalTimestamp timestamp"
)

N_FAKE_RECORDS = 6


def fake_feature(i: int) -> dict:
    """Record i of the deterministic replay stream: a GeoJSON Feature with
    the reference generator's properties payload (send.py:8-22)."""
    return {
        "type": "Feature",
        "properties": {
            "RECEIVED_ON": f"2024-01-01T00:00:{i:02d}.000Z",
            "N02_001": str(11 + i % 3),
            "N02_002": "2",
            "N02_003": "中央線",
            "N02_004": "JR東日本",
            "ID": f"2_{i}",
            "COUNT": 10 + i,
        },
    }


class FakeKinesisDataSource(DataSource):
    """Same format name and record schema as the real connector; validates
    the pinned option names at ``load()`` time so a renamed option in
    ``sources.kinesis_geojson_stream`` fails fast and loudly."""

    @classmethod
    def name(cls) -> str:
        return "aws-kinesis"

    def schema(self) -> str:
        opts = {k.lower() for k in self.options}
        missing = [o for o in REQUIRED_OPTIONS if o not in opts]
        if missing:
            raise ValueError(f"missing required kinesis options: {missing}")
        return KINESIS_RECORD_SCHEMA

    def simpleStreamReader(self, schema):  # noqa: ARG002 — fixed schema
        opts = {k.lower(): v for k, v in self.options.items()}
        return _FakeKinesisReader(opts["kinesis.streamname"])


class _FakeKinesisReader(SimpleDataSourceStreamReader):
    """Offsets are record indexes — the shape (monotone dict-valued offsets,
    read() advancing to latest, readBetweenOffsets() replaying a closed
    range) mirrors how the shard-iterator connector behaves across
    micro-batches and recovery replays."""

    def __init__(self, stream_name: str) -> None:
        self._stream = stream_name

    def _records(self, lo: int, hi: int) -> list[tuple]:
        # a LIST, not a generator: Spark's prefetch cache copy.copy()s the
        # returned iterator for replay, and generators aren't copyable
        return [
            (
                json.dumps(fake_feature(i)).encode("utf-8"),
                self._stream,
                f"pk_{i}",
                str(10**12 + i),  # sequence numbers are huge decimal strings
                datetime.datetime(2024, 1, 1, 0, 0, 0)
                + datetime.timedelta(seconds=i),
            )
            for i in range(lo, min(hi, N_FAKE_RECORDS))
        ]

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        lo = start["index"]
        if lo >= N_FAKE_RECORDS:
            return [], start
        return self._records(lo, N_FAKE_RECORDS), {"index": N_FAKE_RECORDS}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._records(start["index"], end["index"])
