"""Streaming trailing z-score anomaly detection — the stateful twin of
``operators.over_windows.anomaly_zscore`` (which is itself the monitoring
twin of the reference's W5 sliding OVER window,
StreamJobSqlSliding.java:153-160).

Per key, each event is scored against the mean/stddev of the previous
``lookback_rows`` same-key events (self excluded, ≥ ``min_history`` rows of
history) and emitted iff |z| exceeds the threshold — the always-on version
of the batch operator for live monitoring pipelines.

BIT-EXACT batch parity: the batch operator derives the trailing stats from
differences of RUNNING (unbounded-preceding) sums, accumulated left-to-right
by WindowExec. The streaming state therefore stores the last
``lookback_rows + 1`` CUMULATIVE (count, Σv, Σv²) triples — not raw values —
and continues the identical left-to-right accumulation across micro-batches,
so every double the stream computes is the same double the batch WindowExec
computes (same adds in the same order, same difference, same
``det_round(6)``), and the batch-as-oracle test asserts exact equality on an
in-order replay.

Scale shape: state is O(1) per key — (lookback+1)·3 numbers + a row counter,
regardless of rate or retention (compare the W5 sliding operator, whose
state is rate × interval timestamps). Keys shard across executors by hash;
NaN/NULL values occupy a frame position but never enter the sums and are
never flagged themselves — the batch operator normalizes NaN to NULL
(``nanvl``) with exactly the same rule, so parity holds on dirty data too.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# state: total rows seen for the key, then the cumulative triples after each
# of the last (lookback+1) rows, oldest → newest (parallel arrays)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("rows_seen", T.LongType()),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("s1s", T.ArrayType(T.DoubleType())),
        T.StructField("s2s", T.ArrayType(T.DoubleType())),
    ]
)


def _output_schema(key_col: str, ts_col: str, id_col: str, value_col: str) -> T.StructType:
    # field names follow the caller's column names — a hardcoded "ts"/"event_id"
    # would disagree with the yielded pandas columns for non-default inputs
    return T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(key_col, T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("zscore", T.DoubleType()),
        ]
    )


def anomaly_zscore_stream(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    lookback_rows: int = 50,
    min_history: int = 20,
    threshold: float = 3.0,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """events stream → flagged anomalies only (event_id, key, ts, value,
    zscore), scored per arrival order (ties broken by id within a batch)."""
    ring = lookback_rows + 1

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            rows_seen, counts, s1s, s2s = state.get
            counts = np.asarray(counts, dtype=np.int64)
            s1s = np.asarray(s1s, dtype=np.float64)
            s2s = np.asarray(s2s, dtype=np.float64)
        else:
            rows_seen = 0
            counts = np.empty(0, np.int64)
            s1s = np.empty(0, np.float64)
            s2s = np.empty(0, np.float64)

        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts).sort_values([ts_col, id_col], kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        present = ~np.isnan(vals)
        adds = np.where(present, vals, 0.0)
        b = len(pdf)

        prev_c = counts[-1] if len(counts) else 0
        prev_s1 = s1s[-1] if len(s1s) else 0.0
        prev_s2 = s2s[-1] if len(s2s) else 0.0
        # cum[j] = cumulative after the j-th new row; cum[0] = carry-in. The
        # leading carry-in element makes np.cumsum's sequential accumulate
        # reproduce WindowExec's ((carry + v1) + v2) + ... order exactly.
        cum_c = np.cumsum(np.concatenate(([prev_c], present.astype(np.int64))))
        cum_s1 = np.cumsum(np.concatenate(([prev_s1], adds)))
        cum_s2 = np.cumsum(np.concatenate(([prev_s2], adds * adds)))

        # global position of batch row j (1-based) is rows_seen + j; the
        # "before frame" cumulative sits lookback_rows+1 positions back
        j = np.arange(1, b + 1)
        p = rows_seen + j
        q = p - ring  # global row index whose cumulative closes the frame
        back_c = np.zeros(b, np.int64)
        back_s1 = np.zeros(b, np.float64)
        back_s2 = np.zeros(b, np.float64)
        in_batch = q >= rows_seen  # q indexes cum (this batch / carry-in)
        back_c[in_batch] = cum_c[(q - rows_seen)[in_batch]]
        back_s1[in_batch] = cum_s1[(q - rows_seen)[in_batch]]
        back_s2[in_batch] = cum_s2[(q - rows_seen)[in_batch]]
        in_ring = (~in_batch) & (q > 0)  # q rows back lives in the state ring
        if in_ring.any():
            d = rows_seen - q[in_ring]  # 0 = newest ring entry
            idx = len(counts) - 1 - d
            back_c[in_ring] = counts[idx]
            back_s1[in_ring] = s1s[idx]
            back_s2[in_ring] = s2s[idx]
        # q <= 0: empty frame prefix → batch coalesce(…, 0) → zeros already

        n = cum_c[:-1] - back_c  # cumulative up to previous row minus frame start
        ws1 = cum_s1[:-1] - back_s1
        ws2 = cum_s2[:-1] - back_s2
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = ws1 / n
            var = (ws2 - ws1 * ws1 / n) / (n - 1)
            z = np.floor((vals - mean) / np.sqrt(var) * 1e6 + 0.5) / 1e6
        flag = present & (n >= min_history) & (var > 0) & (np.abs(z) > threshold)

        new_counts = np.concatenate((counts, cum_c[1:]))[-ring:]
        new_s1s = np.concatenate((s1s, cum_s1[1:]))[-ring:]
        new_s2s = np.concatenate((s2s, cum_s2[1:]))[-ring:]
        state.update(
            (rows_seen + b, new_counts.tolist(), new_s1s.tolist(), new_s2s.tolist())
        )

        if flag.any():
            out = pdf.loc[flag, [id_col, key_col, ts_col, value_col]].copy()
            out["zscore"] = z[flag]
            yield out

    stream = events.select(
        F.col(id_col), F.col(key_col), F.col(ts_col), F.col(value_col)
    ).withWatermark(ts_col, watermark_delay)
    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=_output_schema(key_col, ts_col, id_col, value_col),
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
