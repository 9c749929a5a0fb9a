"""Sliding event-time range OVER window (reference §2.5 W5) — batch form.

Reference semantics: one output row per input event carrying the count of events
for the same key within the trailing interval —
``COUNT(*) OVER (PARTITION BY N02_001 ORDER BY rowtime RANGE BETWEEN
INTERVAL '30' MINUTE PRECEDING AND CURRENT ROW)``
(/root/reference/.../StreamJobSqlSliding.java:153-160; hardcoded 30-minute variant
StreamJobSingle.java:149-156).

The batch form below is the correctness oracle for the streaming stateful version
(streaming/sliding_state.py). Scale notes: the window shuffles once on the key and
sorts within partitions; per-key data must fit a partition — with skewed keys,
pre-bucket by (key, coarse time bucket) and merge counts across the bucket
boundary, or use the streaming operator which holds only the trailing interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sliding_range_count(
    df: DataFrame,
    key: str = "railway_class",
    ts: str = "rowtime",
    preceding_seconds: int = 30 * 60,
    count_alias: str = "railway_class_count",
) -> DataFrame:
    """Append a trailing-interval count column to every event row.

    Implemented as a range frame over unix seconds: RANGE BETWEEN n PRECEDING AND
    CURRENT ROW on ``unix_ts`` is exactly the reference's interval-range frame.
    Sub-second event times are handled by framing on microseconds.
    """
    micros = (F.unix_micros(F.col(ts))).alias("_ts_us")
    spec = (
        Window.partitionBy(key)
        .orderBy(micros)
        .rangeBetween(-preceding_seconds * 1_000_000, 0)
    )
    return df.withColumn(count_alias, F.count(F.lit(1)).over(spec))
