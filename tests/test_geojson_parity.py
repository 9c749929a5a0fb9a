"""Reference-native path: GeoJSON Feature records (the reference's actual input,
/root/reference/send.py:8-22) through parse → project → window, asserting the
flagship output contract (/root/reference/README.MD:46-51)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kda_flink_demo_spark.io.sources import parse_geojson
from kda_flink_demo_spark.operators.projections import project_railway_events
from kda_flink_demo_spark.operators.windows import tumbling_counts


def _geojson_record(cls: str, received_on: str, ident: str = "1_42") -> str:
    return json.dumps(
        {
            "type": "Feature",
            "properties": {
                "RECEIVED_ON": received_on,
                "N02_001": cls,
                "N02_002": "1",
                "N02_003": "北海道新幹線",  # multibyte UTF-8 in scope (FIXTURES.md)
                "N02_004": "北海道旅客鉄道",
                "ID": ident,
                "COUNT": 15,
            },
        },
        ensure_ascii=False,
    )


def test_geojson_flagship_pipeline(spark):
    records = [
        _geojson_record("11", "2020-09-14T09:20:22.123"),
        _geojson_record("11", "2020-09-14T09:20:45.456"),
        _geojson_record("12", "2020-09-14T09:21:10.789"),
        _geojson_record("11", "not-a-timestamp"),  # exercises the fallback path
    ]
    raw = spark.createDataFrame([(r,) for r in records], ["value"])
    parsed = parse_geojson(raw, "value")
    assert parsed.columns == ["type", "RECEIVED_ON", "N02_001", "N02_002", "N02_003", "N02_004", "ID", "COUNT"]
    # multibyte round-trip
    assert parsed.select("N02_003").first()[0] == "北海道新幹線"

    projected = project_railway_events(
        parsed, fallback=F.lit("2020-09-14 09:22:00").cast("timestamp")
    )
    out = tumbling_counts(projected).orderBy("window_start", "railway_class").collect()
    assert [r.railway_class for r in out] == ["11", "12", "11"]
    assert [r.railway_class_count for r in out] == [2, 1, 1]
    # window bounds are minute-aligned (TUMBLE_START/TUMBLE_END contract)
    assert all(r.window_start.second == 0 and r.window_end.second == 0 for r in out)
    assert out[0].window_start.minute == 20 and out[0].window_end.minute == 21


def test_hopping_rowtime_is_end_minus_1ms(spark):
    from kda_flink_demo_spark.operators.windows import hopping_counts

    raw = spark.createDataFrame(
        [("11", "2020-09-14 09:20:30")], ["railway_class", "s"]
    ).select("railway_class", F.col("s").cast("timestamp").alias("rowtime"))
    rows = hopping_counts(raw).collect()
    assert len(rows) == 2  # size 2m / slide 1m → every event in 2 windows
    for r in rows:
        assert (r.window_end - r.received_on).total_seconds() == 0.001
