"""Projections, casts, timestamp parsing (reference §2.2 P1–P5).

The reference projects ``properties.N02_001`` + ``properties.RECEIVED_ON`` out of the
GeoJSON and drops everything else (/root/reference/.../StreamJobSqlTumbling.java:106-119),
parsing the timestamp with a wall-clock-now fallback on failure (:64-77).

Scale notes: these are pure narrow transformations — no shuffle, fully inside
whole-stage codegen. Early projection (selecting 2 of 7 fields) is what lets the
parquet/Kinesis scan prune columns; Catalyst does this automatically, but building
the projection explicitly right after the source keeps the scan schema minimal even
when later stages are opaque (e.g. foreachBatch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The generator emits 3 fractional digits (/root/reference/send.py:12) although the
# reference's parser declares SSSSSS (StreamJobSqlTumbling.java:65) — we parse
# strictly at millisecond precision and fall back explicitly (quirk list SURVEY §7.3).
RECEIVED_ON_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSS"


def parse_ts_with_fallback(
    col, fmt: str = RECEIVED_ON_FORMAT, fallback: Column | None = None
) -> Column:
    """P2: strict timestamp parse; malformed values take the fallback instead of
    failing the job (reference behavior: fall back to wall-clock now,
    /root/reference/.../StreamJobSqlTumbling.java:64-77).

    For deterministic tests pass a literal fallback; production uses the default
    ``current_timestamp()`` to mirror the reference exactly.
    """
    parsed = F.try_to_timestamp(F.col(col) if isinstance(col, str) else col, F.lit(fmt))
    return F.coalesce(parsed, fallback if fallback is not None else F.current_timestamp())


def project_railway_events(parsed_geojson: DataFrame, fallback: Column | None = None) -> DataFrame:
    """P1+P2+P3: GeoJSON columns → (railway_class string, rowtime timestamp).

    Mirrors the reference's map() projection + CAST AS VARCHAR(10)
    (/root/reference/.../StreamJobSqlTumbling.java:106-119,147).
    """
    return parsed_geojson.select(
        F.col("N02_001").cast("string").alias("railway_class"),
        parse_ts_with_fallback("RECEIVED_ON", fallback=fallback).alias("rowtime"),
    )
