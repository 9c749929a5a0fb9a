"""Streaming sliding event-time range-OVER count (reference W5) — the one
genuinely custom stateful operator (SURVEY §4.2.1).

Reference semantics (`StreamJobSqlSliding.java:153-160`): one output row per
input event carrying COUNT(*) of same-key events in the trailing interval
(RANGE BETWEEN INTERVAL 'n' PRECEDING AND CURRENT ROW). Unbounded per-event
OVER windows are unsupported in Structured Streaming, so this implements the
operator with ``applyInPandasWithState``: per key, a sorted buffer of event
timestamps (micros), pruned below ``watermark − interval``; each batch's events
are counted against buffer + in-batch earlier events via binary search.

The batch form (`operators.over_windows.sliding_range_count`) is the
correctness oracle — on an in-order bounded replay the outputs are identical
(tests/test_streaming.py). Divergence note (SURVEY §2.3 T2): Spark watermarks
advance per micro-batch, not per record, so *which* out-of-order rows are
dropped as late can differ from Flink's per-record watermark; end-of-stream
results match on in-order replays.

Scale notes: state per key is one int64 per event in the trailing interval —
bounded by rate × interval, pruned every batch by the global watermark. Keys
shard across executors by hash (same as Flink's keyBy); skewed keys bound the
operator exactly as they do the reference.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([T.StructField("times", T.ArrayType(T.LongType()))])


def _output_schema(key_field: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField(key_field, T.StringType()),
            T.StructField("rowtime", T.TimestampType()),
            T.StructField("railway_class_count", T.LongType()),
        ]
    )


def sliding_range_count_stream(
    events: DataFrame,
    key: str = "railway_class",
    ts: str = "rowtime",
    preceding_seconds: int = 30 * 60,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """events(event_id, key, ts) stream → one row per event with the trailing
    interval count, exactly-once w.r.t. the downstream idempotent sink."""
    interval_us = preceding_seconds * 1_000_000

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import bisect

        times: list[int] = state.get[0] if state.exists else []
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("rowtime")
            for _, row in pdf.iterrows():
                t_us = int(row["rowtime"].value) // 1000  # pandas ns → micros
                bisect.insort(times, t_us)
                lo = bisect.bisect_left(times, t_us - interval_us)
                hi = bisect.bisect_right(times, t_us)
                out.append((int(row["event_id"]), key_tuple[0], row["rowtime"], hi - lo))
        # prune below watermark − interval: no future non-late event can reach
        # back past that, so counts are unaffected
        wm_ms = state.getCurrentWatermarkMs()
        if wm_ms > 0:
            cutoff = wm_ms * 1000 - interval_us
            import bisect as b2

            times = times[b2.bisect_left(times, cutoff):]
        state.update((times,))
        yield pd.DataFrame(
            out, columns=["event_id", "rowtime_key", "rowtime", "railway_class_count"]
        ).rename(columns={"rowtime_key": key})

    renamed = events.select(
        F.col("event_id"), F.col(key).cast("string").alias(key), F.col(ts).alias("rowtime")
    ).withWatermark("rowtime", watermark_delay)
    return renamed.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=_output_schema(key),
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
