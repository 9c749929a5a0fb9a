"""Event-time TIMER-driven session finalization on
``transformWithStateInPandas`` — the third TWS operator, covering the one
API member the ListState (sliding) and ValueState (count-window) twins
don't: registered event-time timers + ``handleExpiredTimer``.

Semantics (Flink session-gap equivalent, same values as the batch
``windows.session_counts``): per key, events within ``gap`` of each other
form one session; a session EMITS (key, window_start, window_end =
last + gap, count) when either
- a later event of the same key arrives beyond the gap (closed in
  ``handleInputRows`` — also covers multiple sessions closing inside one
  batch, split on the sorted in-batch gaps), or
- the event-time watermark passes last + gap with no newer event: the
  registered TIMER fires and ``handleExpiredTimer`` flushes the session and
  clears state — the piece a watermark-less count window doesn't need and a
  pure-aggregation session can't express without the engine's built-in
  session_window.

State per key: one (count, start_us, last_us) triple + exactly one
registered timer (the previous timer is deleted on every update), so state
is O(keys) and timers O(keys) at any scale. Batch-as-oracle parity is
pinned in tests FOR IN-ORDER / zero-delay replays: every emitted session
then equals the batch session exactly, and at most one session per key (the
still-open tail) may be unflushed at stream end.

Out-of-order caveat (r08 advice): with a nonzero ``watermark_delay``, an
admitted late event OLDER than the standing session is MERGED into it — the
split predicate clamps each event's predecessor to the standing session's
last time (``max(prev, base_us)``) so a session end never moves backwards.
That is the classic streaming-session merge behavior (Flink merges late
events into any overlapping-or-adjacent window too), but it means a late
event more than ``gap`` older than the standing session extends that session
backwards instead of forming its own — a batch recompute over the full
timeline WOULD split them. Exact batch parity under disorder needs
watermark-delayed buffering (sort-and-hold until the watermark passes);
this operator deliberately trades that extra per-key buffer state for the
O(1)-per-key triple, and the tests pin parity only where it is claimed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _output_schema(key_field: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(key_field, T.StringType()),
            T.StructField("window_start", T.TimestampType()),
            T.StructField("window_end", T.TimestampType()),
            T.StructField("railway_class_count", T.LongType()),
        ]
    )


def session_finalize_tws(
    events: DataFrame,
    key: str = "railway_class",
    ts: str = "rowtime",
    gap_seconds: int = 300,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_seconds * 1_000_000

    def _emit(key_val, cnt, start_us, last_us):
        return pd.DataFrame(
            {
                key: [key_val],
                "window_start": pd.to_datetime([start_us], unit="us"),
                "window_end": pd.to_datetime([last_us + gap_us], unit="us"),
                "railway_class_count": pd.Series([cnt], dtype="int64"),
            }
        )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._sess = handle.getValueState(
                "sess", "cnt BIGINT, start_us BIGINT, last_us BIGINT"
            )

        def handleInputRows(self, key_tuple, rows, timer_values):
            import numpy as np

            parts = [p for p in rows if len(p)]
            if not parts:
                return iter([])
            pdf = pd.concat(parts) if len(parts) > 1 else parts[0]
            t_us = np.sort(
                (pdf["rowtime"].astype("int64").to_numpy() // 1000).astype(np.int64)
            )
            out = []
            base_us = None  # the standing session's last time, when continuing
            if self._sess.exists():
                cnt, start_us, last_us = self._sess.get()
                self._handle.deleteTimer((last_us + gap_us) // 1000)
                if int(t_us[0]) - last_us > gap_us:
                    # every batch event (min included) is beyond the gap —
                    # the standing session closes before anything merges
                    out.append(_emit(key_tuple[0], cnt, start_us, last_us))
                    cnt, start_us = 0, int(t_us[0])
                else:
                    base_us = last_us
            else:
                cnt, start_us = 0, int(t_us[0])
            # split the sorted batch on gaps of the MERGED timeline: with a
            # nonzero watermark delay a batch can carry events OLDER than the
            # standing session's last time, so the predecessor of t[i] is
            # max(state last, t[i-1]) — a session end must never move
            # backwards (r08 second-review finding: plain np.diff(t_us) let a
            # late event regress last_us and manufacture a false split)
            prev = t_us[:-1]
            if base_us is not None:
                prev = np.maximum(prev, base_us)
            breaks = np.nonzero((t_us[1:] - prev) > gap_us)[0]
            seg_start = 0
            for b in breaks:
                seg = t_us[seg_start : b + 1]
                seg_last = int(seg[-1])
                if base_us is not None and seg_start == 0:
                    seg_last = max(seg_last, base_us)  # only the first
                    # segment can contain the standing session
                out.append(
                    _emit(
                        key_tuple[0],
                        cnt + len(seg),
                        min(start_us, int(seg[0])),
                        seg_last,
                    )
                )
                cnt, seg_start = 0, b + 1
                start_us = int(t_us[seg_start])
            tail = t_us[seg_start:]
            cnt += len(tail)
            start_us = min(start_us, int(tail[0]))
            last_us = int(tail[-1])
            if base_us is not None and seg_start == 0:
                last_us = max(last_us, base_us)
            self._sess.update((int(cnt), int(start_us), int(last_us)))
            self._handle.registerTimer((last_us + gap_us) // 1000)
            return iter(out)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):  # noqa: N803
            # pyspark's runner invokes this by KEYWORD with the ABC's exact
            # parameter names — renaming them breaks dispatch
            key_tuple, expired_timer_info = key, expiredTimerInfo
            if not self._sess.exists():
                return iter([])
            cnt, start_us, last_us = self._sess.get()
            # only the CURRENT session's timer flushes; a stale timer (state
            # advanced after registration — shouldn't happen given the
            # delete-on-update, but replay safety is cheap) is ignored
            if expired_timer_info.getExpiryTimeInMs() != (last_us + gap_us) // 1000:
                return iter([])
            self._sess.clear()
            return iter([_emit(key_tuple[0], cnt, start_us, last_us)])

        def close(self) -> None:
            pass

    renamed = events.select(
        F.col(key).cast("string").alias(key), F.col(ts).alias("rowtime")
    ).withWatermark("rowtime", watermark_delay)
    return renamed.groupBy(key).transformWithStateInPandas(
        statefulProcessor=SessionProcessor(),
        outputStructType=_output_schema(key),
        outputMode="Append",
        timeMode="EventTime",
    )
