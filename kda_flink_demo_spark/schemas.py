"""Schemas: the reference's GeoJSON input contract and the testdata star schema.

The reference consumes GeoJSON ``Feature`` records whose ``properties`` carry the
event payload (/root/reference/README.MD:15-43, send.py:8-22) and imposes its schema
only at the projection ``map`` (/root/reference/.../StreamJobSqlTumbling.java:106-119).
Spark-side we declare the full StructType up front and parse with ``from_json`` —
never schema inference on a stream (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# GeoJSON Feature with the reference's properties payload
# (/root/reference/send.py:8-22; README.MD:17-27).
GEOJSON_PROPERTIES_SCHEMA = T.StructType(
    [
        T.StructField("RECEIVED_ON", T.StringType()),  # ISO-8601 ms precision; event time
        T.StructField("N02_001", T.StringType()),  # railway class '11'..'18' — group key
        T.StructField("N02_002", T.StringType()),  # '1'..'5'
        T.StructField("N02_003", T.StringType()),  # line name (Japanese, multibyte UTF-8)
        T.StructField("N02_004", T.StringType()),  # operator name
        T.StructField("ID", T.StringType()),  # partition key N02_002 + '_' + randint
        T.StructField("COUNT", T.LongType()),  # 10..20, carried but never aggregated
    ]
)

GEOJSON_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),  # constant "Feature"
        T.StructField("properties", GEOJSON_PROPERTIES_SCHEMA),
    ]
)

# Flagship output contract (/root/reference/README.MD:46-51): sink PK is
# (RAILWAY_CLASS, WINDOW_START, WINDOW_END) (README.MD:88).
FLAGSHIP_OUTPUT_COLUMNS = [
    "railway_class",
    "railway_class_count",
    "window_start",
    "window_end",
]

# Driver-provided synthetic tables (TESTDATA.md / FIXTURES.md).
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON blob, e.g. {"k": 87}
    ]
)
