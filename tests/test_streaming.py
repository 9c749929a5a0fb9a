"""Streaming semantics tests (SURVEY §5.2): replay the events fixture through a
file stream with a 0-second watermark and assert the sink equals the batch
computation of the same query (batch-as-oracle), including the idempotent-upsert
replay guarantee (the reference's O5 effectively-exactly-once behavior)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kda_flink_demo_spark.io.sources import load_table
from kda_flink_demo_spark.operators.over_windows import sliding_range_count
from kda_flink_demo_spark.operators.windows import hopping_counts, tumbling_counts
from kda_flink_demo_spark.streaming import jobs
from kda_flink_demo_spark.streaming.upsert import DuckDBUpsertSink
from tests.conftest import SF_DIR

TUMBLING_SINK_SCHEMA_SESS = (
    "railway_class VARCHAR, railway_class_count BIGINT, "
    "window_start TIMESTAMP, window_end TIMESTAMP"
)


@pytest.fixture(scope="module")
def replay_dir(spark, tmp_path_factory):
    """events sorted by ts, chunked into 5 time-ordered parquet files so the
    micro-batch replay sees in-order arrival (late-drop timing divergence from
    Flink's per-record watermark doesn't bite on in-order replays)."""
    out = str(tmp_path_factory.mktemp("events_replay"))
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime"))
        .orderBy("rowtime")
    )
    rows = ev.collect()
    n = len(rows)
    chunk = (n + 4) // 5
    for i in range(5):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, ev.schema).coalesce(1).write.parquet(f"{out}/chunk={i:02d}")
    return out


def _build_replay(spark, df, path, n_chunks=5):
    """Chunk an (already ordered) DataFrame into n time-ordered parquet files
    for maxFilesPerTrigger replay — the shared builder behind replay_dir and
    the per-test replays that need extra columns."""
    rows = df.collect()
    chunk = (len(rows) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, df.schema).coalesce(1).write.parquet(
                f"{path}/chunk={i:02d}"
            )


def _stream(spark, replay_dir):
    from kda_flink_demo_spark.schemas import EVENTS_SCHEMA
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("railway_class", T.StringType()),
            T.StructField("rowtime", T.TimestampType()),
        ]
    )
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(replay_dir + "/chunk=*")
    )


def _run(spark, result, sink, checkpoint):
    q = jobs.run_to_sink(result, sink, checkpoint)
    q.awaitTermination(300)
    assert not q.isActive


def test_streaming_tumbling_matches_batch(spark, replay_dir, tmp_path):
    sink = DuckDBUpsertSink(
        str(tmp_path / "sink.duckdb"), "tumbling", jobs.TUMBLING_SINK_KEYS, jobs.TUMBLING_SINK_SCHEMA
    )
    result = jobs.job_tumbling(_stream(spark, replay_dir))
    _run(spark, result, sink, str(tmp_path / "ckpt"))

    cols, got = sink.read_all()
    batch = tumbling_counts(
        load_table(spark, SF_DIR, "events").select(
            F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
        )
    )
    expected = {(r.railway_class, r.window_start, r.window_end): r.railway_class_count for r in batch.collect()}
    got_map = {
        (r[cols.index("railway_class")], r[cols.index("window_start")], r[cols.index("window_end")]):
        r[cols.index("railway_class_count")]
        for r in got
    }
    # append-mode with watermark 0s: every closed window must match the batch
    # value; the final partial windows only emit if the source signals EOS, so
    # compare on the intersection and require near-complete coverage
    assert len(got_map) >= len(expected) - 10
    for k, v in got_map.items():
        assert expected[k] == v, f"window {k}: stream={v} batch={expected[k]}"


def test_upsert_sink_is_idempotent_on_replay(spark, tmp_path):
    sink = DuckDBUpsertSink(
        str(tmp_path / "sink2.duckdb"), "tumbling", jobs.TUMBLING_SINK_KEYS, jobs.TUMBLING_SINK_SCHEMA
    )
    batch = tumbling_counts(
        load_table(spark, SF_DIR, "events").select(
            F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
        )
    )
    sink(batch, 0)
    _, once = sink.read_all()
    sink(batch, 0)  # replayed micro-batch, same batchId → same PKs, same values
    _, twice = sink.read_all()
    assert sorted(once) == sorted(twice)


def test_streaming_sliding_state_matches_batch(spark, replay_dir, tmp_path):
    sink = DuckDBUpsertSink(
        str(tmp_path / "sink3.duckdb"), "sliding", jobs.SLIDING_SINK_KEYS, jobs.SLIDING_SINK_SCHEMA
    )
    events = _stream(spark, replay_dir)
    result = jobs.job_sliding(events, preceding_seconds=30 * 60)
    _run(spark, result, sink, str(tmp_path / "ckpt3"))

    cols, got = sink.read_all()
    batch = sliding_range_count(
        load_table(spark, SF_DIR, "events").select(
            "event_id", F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
        ),
        preceding_seconds=30 * 60,
    )
    expected = {
        (r.event_id, r.railway_class, r.rowtime): r.railway_class_count for r in batch.collect()
    }
    got_map = {
        (r[cols.index("event_id")], r[cols.index("railway_class")], r[cols.index("rowtime")]):
        r[cols.index("railway_class_count")]
        for r in got
    }
    assert len(got_map) == len(expected)
    mismatches = {k: (v, expected[k]) for k, v in got_map.items() if expected[k] != v}
    assert not mismatches, f"{len(mismatches)} mismatches, e.g. {list(mismatches.items())[:3]}"


@pytest.mark.parametrize(
    "job_name,batch_fn",
    [
        (
            "StreamJobTumblingOffset",
            lambda ev: tumbling_counts(ev, offset="30 seconds"),
        ),
        ("StreamJobSqlHopping", lambda ev: hopping_counts(ev)),
    ],
)
def test_streaming_windows_match_batch(spark, replay_dir, tmp_path, job_name, batch_fn):
    """W3 offset and W4 hopping streaming jobs equal their batch twins."""
    schema_sql = jobs.TUMBLING_SINK_SCHEMA
    keys = jobs.TUMBLING_SINK_KEYS
    if job_name == "StreamJobSqlHopping":
        schema_sql += ", received_on TIMESTAMP"
    sink = DuckDBUpsertSink(str(tmp_path / f"{job_name}.duckdb"), "w", keys, schema_sql)
    result = jobs.dispatch(job_name)(_stream(spark, replay_dir))
    _run(spark, result, sink, str(tmp_path / f"ckpt_{job_name}"))
    cols, got = sink.read_all()
    ev = load_table(spark, SF_DIR, "events").select(
        F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
    )
    expected = {tuple(r[k] for k in keys): r.railway_class_count for r in batch_fn(ev).collect()}
    got_map = {tuple(r[cols.index(k)] for k in keys): r[cols.index("railway_class_count")] for r in got}
    assert len(got_map) >= len(expected) - 20  # trailing open windows may not emit
    for k, v in got_map.items():
        assert expected[k] == v, f"{job_name} window {k}: stream={v} batch={expected[k]}"


def test_crash_recovery_mid_stream(spark, replay_dir, tmp_path):
    """Stronger O5 check: stop the query after the first micro-batch (simulated
    crash), restart from the checkpoint, drain — final sink must equal the batch
    computation exactly (no lost or double-counted windows)."""
    import time

    sink = DuckDBUpsertSink(
        str(tmp_path / "crash.duckdb"), "tumbling", jobs.TUMBLING_SINK_KEYS, jobs.TUMBLING_SINK_SCHEMA
    )
    ckpt = str(tmp_path / "crash_ckpt")

    # phase 1: continuous trigger, kill after ≥1 committed batch
    q = (
        jobs.job_tumbling(_stream(spark, replay_dir))
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in (q.recentProgress or [])):
            break
        time.sleep(0.5)
    q.stop()
    _, mid = sink.read_all()

    # phase 2: restart from the same checkpoint, drain the rest
    q2 = jobs.run_to_sink(jobs.job_tumbling(_stream(spark, replay_dir)), sink, ckpt)
    q2.awaitTermination(300)
    cols, got = sink.read_all()

    batch = tumbling_counts(
        load_table(spark, SF_DIR, "events").select(
            F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
        )
    )
    expected = {
        (r.railway_class, r.window_start, r.window_end): r.railway_class_count
        for r in batch.collect()
    }
    got_map = {
        (r[cols.index("railway_class")], r[cols.index("window_start")], r[cols.index("window_end")]):
        r[cols.index("railway_class_count")]
        for r in got
    }
    assert len(got_map) > len(mid), "restart should have made progress beyond the crash point"
    for k, v in got_map.items():
        assert expected[k] == v, f"window {k}: stream={v} batch={expected[k]}"


def test_streaming_session_windows_match_batch(spark, replay_dir, tmp_path):
    """W6 streaming: session windows with state-store merge across batches."""
    from kda_flink_demo_spark.operators.windows import session_counts

    sink = DuckDBUpsertSink(
        str(tmp_path / "sess.duckdb"), "sessions", jobs.TUMBLING_SINK_KEYS, jobs.TUMBLING_SINK_SCHEMA
    )
    result = session_counts(_stream(spark, replay_dir).withWatermark("rowtime", "0 seconds"))
    _run(spark, result, sink, str(tmp_path / "sess_ckpt"))
    cols, got = sink.read_all()
    ev = load_table(spark, SF_DIR, "events").select(
        F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
    )
    expected = {
        (r.railway_class, r.window_start, r.window_end): r.railway_class_count
        for r in session_counts(ev).collect()
    }
    got_map = {
        (r[cols.index("railway_class")], r[cols.index("window_start")], r[cols.index("window_end")]):
        r[cols.index("railway_class_count")]
        for r in got
    }
    assert len(got_map) >= len(expected) - 10  # trailing open sessions may not emit
    for k, v in got_map.items():
        assert expected[k] == v, f"session {k}: stream={v} batch={expected[k]}"


def test_out_of_order_chunk_semantics(spark, tmp_path):
    """T2 divergence, pinned to Spark's ACTUAL behavior (verified empirically on
    4.1.2): the late-event filter uses the watermark as of the batch START — one
    batch behind eviction. A whole chunk arriving one batch after the watermark
    jumped is therefore still ACCEPTED (Flink's per-record watermark would drop
    it); windows it reopens re-emit, and a window spanning the chunk boundary
    may re-emit a PARTIAL count. The max-merge upsert sink absorbs exactly that:
    no window ever regresses, and every fully-reopened window lands on the full
    batch value."""
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime"))
        .orderBy("rowtime")
    )
    rows = ev.collect()
    n = len(rows)
    early, late, tail = rows[: n // 3], rows[n // 3 : 2 * n // 3], rows[2 * n // 3 :]
    out = str(tmp_path / "ooo_replay")
    # arrival order: early, TAIL (jumps the watermark forward), then LATE
    for i, part in enumerate([early, tail, late]):
        spark.createDataFrame(part, ev.schema).coalesce(1).write.parquet(f"{out}/chunk={i:02d}")

    sink = DuckDBUpsertSink(
        str(tmp_path / "ooo.duckdb"),
        "tumbling",
        jobs.TUMBLING_SINK_KEYS,
        jobs.TUMBLING_SINK_SCHEMA,
        merge="max",
    )
    _run(spark, jobs.job_tumbling(_stream(spark, out)), sink, str(tmp_path / "ooo_ckpt"))
    cols, got = sink.read_all()
    got_map = {
        (r[cols.index("railway_class")], r[cols.index("window_start")], r[cols.index("window_end")]):
        r[cols.index("railway_class_count")]
        for r in got
    }
    full_batch = {
        (r.railway_class, r.window_start, r.window_end): r.railway_class_count
        for r in tumbling_counts(ev).collect()
    }
    # no spurious windows, no over-counting
    assert set(got_map) <= set(full_batch)
    assert all(v <= full_batch[k] for k, v in got_map.items())
    # the late chunk was accepted (lagging late-filter): nearly every window
    # matches the full batch; only chunk-boundary windows may hold a partial
    mismatch = {k: (v, full_batch[k]) for k, v in got_map.items() if full_batch[k] != v}
    assert len(mismatch) <= 4, f"too many partial windows: {list(mismatch.items())[:5]}"
    assert len(got_map) >= len(full_batch) - 10


def test_watermark_delay_keeps_late_data(spark, tmp_path):
    """With a positive watermark delay, late rows inside the allowed lateness
    ARE counted: replay [days 0–20 minus a hole, the hole (days 10–12, late),
    days 20–30] with a 15-day delay. The final watermark (day30 − 15d = day15)
    closes the hole's windows, which must match the FULL batch — proving the
    late chunk landed in still-open state."""
    import datetime as dt

    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime"))
        .orderBy("rowtime")
    )
    rows = ev.collect()
    t0 = min(r.rowtime for r in rows)
    day = lambda x: t0 + dt.timedelta(days=x)  # noqa: E731
    late = [r for r in rows if day(10) <= r.rowtime < day(12)]
    main = [r for r in rows if r.rowtime < day(20) and not (day(10) <= r.rowtime < day(12))]
    tail = [r for r in rows if r.rowtime >= day(20)]
    assert late and main and tail
    out = str(tmp_path / "wm_replay")
    for i, part in enumerate([main, late, tail]):
        spark.createDataFrame(part, ev.schema).coalesce(1).write.parquet(f"{out}/chunk={i:02d}")

    sink = DuckDBUpsertSink(
        str(tmp_path / "wm.duckdb"), "tumbling", jobs.TUMBLING_SINK_KEYS, jobs.TUMBLING_SINK_SCHEMA
    )
    result = tumbling_counts(_stream(spark, out).withWatermark("rowtime", "15 days"))
    _run(spark, result, sink, str(tmp_path / "wm_ckpt"))
    cols, got = sink.read_all()
    got_map = {
        (r[cols.index("railway_class")], r[cols.index("window_start")], r[cols.index("window_end")]):
        r[cols.index("railway_class_count")]
        for r in got
    }
    full_batch = {
        (r.railway_class, r.window_start, r.window_end): r.railway_class_count
        for r in tumbling_counts(ev).collect()
    }
    # every emitted window matches the full batch (late rows included) ...
    for k, v in got_map.items():
        assert full_batch[k] == v, f"window {k}: stream={v} batch={full_batch[k]}"
    # ... and the late chunk's windows did emit
    late_windows = {k for k in full_batch if day(10) <= k[1] < day(12)}
    emitted_late = late_windows & set(got_map)
    assert emitted_late, "late-chunk windows should have closed and emitted"


def test_update_mode_with_upsert_converges_to_batch(spark, replay_dir, tmp_path):
    """O-mode breadth: update output mode emits windows as they CHANGE (not just
    when they close); the keyed upsert makes later emissions overwrite earlier
    partials, so the final sink equals the batch result exactly — including the
    trailing windows append mode never emits."""
    sink = DuckDBUpsertSink(
        str(tmp_path / "upd.duckdb"), "tumbling", jobs.TUMBLING_SINK_KEYS, jobs.TUMBLING_SINK_SCHEMA
    )
    result = jobs.job_tumbling(_stream(spark, replay_dir))
    q = (
        result.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "upd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    cols, got = sink.read_all()
    batch = tumbling_counts(
        load_table(spark, SF_DIR, "events").select(
            F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
        )
    )
    expected = {
        (r.railway_class, r.window_start, r.window_end): r.railway_class_count
        for r in batch.collect()
    }
    got_map = {
        (r[cols.index("railway_class")], r[cols.index("window_start")], r[cols.index("window_end")]):
        r[cols.index("railway_class_count")]
        for r in got
    }
    assert got_map == expected


def test_rocksdb_state_store_provider(spark, replay_dir, tmp_path):
    """The at-scale state backend loads and produces identical results."""
    from kda_flink_demo_spark.streaming.jobs import ROCKSDB_PROVIDER, use_rocksdb_state

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    use_rocksdb_state(spark)
    try:
        sink = DuckDBUpsertSink(
            str(tmp_path / "rocks.duckdb"), "tumbling", jobs.TUMBLING_SINK_KEYS, jobs.TUMBLING_SINK_SCHEMA
        )
        _run(spark, jobs.job_tumbling(_stream(spark, replay_dir)), sink, str(tmp_path / "rocks_ckpt"))
        cols, got = sink.read_all()
        batch = tumbling_counts(
            load_table(spark, SF_DIR, "events").select(
                F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
            )
        )
        expected = {
            (r.railway_class, r.window_start, r.window_end): r.railway_class_count
            for r in batch.collect()
        }
        got_map = {
            (r[cols.index("railway_class")], r[cols.index("window_start")], r[cols.index("window_end")]):
            r[cols.index("railway_class_count")]
            for r in got
        }
        assert len(got_map) >= len(expected) - 10
        for k, v in got_map.items():
            assert expected[k] == v
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_transform_with_state_matches_batch(spark, replay_dir, tmp_path):
    """The transformWithStateInPandas twin of the sliding operator (Spark 4's
    successor stateful API) produces identical results to the batch oracle.
    Runs through the protobuf shim (protobuf_compat / pb_shim: SDK-bundled
    pure-python runtime + runtime_version back-fill, exported to workers via
    PYTHONPATH in conftest); skips only where no usable protobuf exists at
    all."""
    from kda_flink_demo_spark.streaming import protobuf_compat

    if not protobuf_compat.tws_available():
        pytest.skip("transformWithStateInPandas requires google.protobuf (none shimmable here)")
    from kda_flink_demo_spark.streaming.jobs import use_rocksdb_state
    from kda_flink_demo_spark.streaming.sliding_state import sliding_range_count_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    use_rocksdb_state(spark)  # transformWithStateInPandas requires RocksDB
    sink = DuckDBUpsertSink(
        str(tmp_path / "tws.duckdb"), "sliding", jobs.SLIDING_SINK_KEYS, jobs.SLIDING_SINK_SCHEMA
    )
    try:
        result = sliding_range_count_tws(_stream(spark, replay_dir), preceding_seconds=30 * 60)
        _run(spark, result, sink, str(tmp_path / "tws_ckpt"))
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    cols, got = sink.read_all()
    batch = sliding_range_count(
        load_table(spark, SF_DIR, "events").select(
            "event_id", F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
        ),
        preceding_seconds=30 * 60,
    )
    expected = {
        (r.event_id, r.railway_class, r.rowtime): r.railway_class_count for r in batch.collect()
    }
    got_map = {
        (r[cols.index("event_id")], r[cols.index("railway_class")], r[cols.index("rowtime")]):
        r[cols.index("railway_class_count")]
        for r in got
    }
    assert len(got_map) == len(expected)
    mismatches = {k: (v, expected[k]) for k, v in got_map.items() if expected[k] != v}
    assert not mismatches, f"{len(mismatches)} mismatches, e.g. {list(mismatches.items())[:3]}"


def test_dispatch_no_fallthrough():
    assert jobs.dispatch("StreamJobSqlTumbling") is jobs.job_tumbling
    with pytest.raises(KeyError):
        jobs.dispatch("NoSuchJob")


# ---------------------------------------------------------------------------
# Executor-parallel sink (reference task-side writes, SinkDataApiTumbling.java:59-85)
# ---------------------------------------------------------------------------


def test_executor_staged_sink_streaming_matches_batch(spark, replay_dir, tmp_path):
    from kda_flink_demo_spark.streaming.upsert import ExecutorStagedUpsertSink

    sink = ExecutorStagedUpsertSink(
        str(tmp_path / "exec_sink.duckdb"),
        "tumbling",
        jobs.TUMBLING_SINK_KEYS,
        jobs.TUMBLING_SINK_SCHEMA,
        staging_dir=str(tmp_path / "staging"),
    )
    result = jobs.job_tumbling(_stream(spark, replay_dir))
    _run(spark, result, sink, str(tmp_path / "ckpt_exec"))

    cols, got = sink.read_all()
    batch = tumbling_counts(
        load_table(spark, SF_DIR, "events").select(
            F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
        )
    )
    expected = {
        (r.railway_class, r.window_start, r.window_end): r.railway_class_count
        for r in batch.collect()
    }
    got_map = {
        (r[cols.index("railway_class")], r[cols.index("window_start")], r[cols.index("window_end")]):
        r[cols.index("railway_class_count")]
        for r in got
    }
    assert len(got_map) >= len(expected) - 10
    for k, v in got_map.items():
        assert expected[k] == v, f"window {k}: stream={v} batch={expected[k]}"


def test_executor_staged_sink_idempotent_on_replay(spark, tmp_path):
    from kda_flink_demo_spark.streaming.upsert import ExecutorStagedUpsertSink

    sink = ExecutorStagedUpsertSink(
        str(tmp_path / "exec_sink2.duckdb"),
        "tumbling",
        jobs.TUMBLING_SINK_KEYS,
        jobs.TUMBLING_SINK_SCHEMA,
        staging_dir=str(tmp_path / "staging2"),
    )
    batch = tumbling_counts(
        load_table(spark, SF_DIR, "events").select(
            F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
        )
    )
    sink(batch, 0)
    _, once = sink.read_all()
    sink(batch, 0)  # replayed micro-batch, same batchId → same staging path, same PKs
    _, twice = sink.read_all()
    assert sorted(once) == sorted(twice)
    assert len(once) > 0


def test_executor_staged_sink_crash_recovery(spark, replay_dir, tmp_path):
    """Kill the query mid-stream, restart from the same checkpoint — the staged
    sink must converge to the batch result exactly like the driver-side sink."""
    from kda_flink_demo_spark.streaming.upsert import ExecutorStagedUpsertSink

    sink = ExecutorStagedUpsertSink(
        str(tmp_path / "exec_sink3.duckdb"),
        "tumbling",
        jobs.TUMBLING_SINK_KEYS,
        jobs.TUMBLING_SINK_SCHEMA,
        staging_dir=str(tmp_path / "staging3"),
    )
    ckpt = str(tmp_path / "ckpt_crash")

    q = (
        jobs.job_tumbling(_stream(spark, replay_dir))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink)
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time as _time

    _time.sleep(8)
    q.stop()  # crash mid-stream
    q.awaitTermination(60)

    # restart from the same checkpoint: pending batch replays into the sink
    q2 = (
        jobs.job_tumbling(_stream(spark, replay_dir))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)

    cols, got = sink.read_all()
    batch = tumbling_counts(
        load_table(spark, SF_DIR, "events").select(
            F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
        )
    )
    expected = {
        (r.railway_class, r.window_start, r.window_end): r.railway_class_count
        for r in batch.collect()
    }
    for r in got:
        k = (
            r[cols.index("railway_class")],
            r[cols.index("window_start")],
            r[cols.index("window_end")],
        )
        assert expected[k] == r[cols.index("railway_class_count")]


def test_jdbc_partition_writer_batches_and_commits():
    """The per-partition JDBC writer (task-thread twin of the reference sink):
    verify statement shape, executemany chunking, and commit/close — against a
    recording fake connection (no DB server in this container)."""
    from kda_flink_demo_spark.streaming.upsert import jdbc_partition_writer

    class FakeCursor:
        def __init__(self, log):
            self.log = log

        def executemany(self, sql, rows):
            self.log.append(("executemany", sql, list(rows)))

    class FakeConn:
        instances = []

        def __init__(self):
            self.log = []
            self.committed = False
            self.closed = False
            FakeConn.instances.append(self)

        def cursor(self):
            return FakeCursor(self.log)

        def commit(self):
            self.committed = True

        def close(self):
            self.closed = True

    writer = jdbc_partition_writer(FakeConn, "t", ["k", "v"], ["k"], batch_size=2)
    rows = [{"k": i, "v": i * 10} for i in range(5)]
    writer(iter(rows))

    con = FakeConn.instances[-1]
    assert con.committed and con.closed
    chunks = [r for op, _, r in con.log if op == "executemany"]
    assert [len(c) for c in chunks] == [2, 2, 1]
    sql = con.log[0][1]
    assert "ON CONFLICT (k) DO UPDATE SET v = EXCLUDED.v" in sql
    assert sql.startswith("INSERT INTO t (k, v) VALUES (?, ?)")


def test_streaming_exact_dedup_emits_each_event_once(spark, replay_dir, tmp_path):
    """Streaming form of the exact-dedup operator: replay every chunk TWICE
    (duplicate arrivals are the at-least-once source reality) and assert
    dropDuplicates state emits each event_id exactly once across the run.
    Unbounded dedup state here is fine for the bounded test replay; production
    bounds it with dropDuplicatesWithinWatermark over the dup-arrival horizon."""
    import glob
    import shutil

    dup_dir = tmp_path / "dup_replay"
    dup_dir.mkdir()
    files = sorted(glob.glob(replay_dir + "/chunk=*/*.parquet"))
    assert files
    for i, f in enumerate(files):
        shutil.copy(f, dup_dir / f"a{i:02d}.parquet")
        shutil.copy(f, dup_dir / f"b{i:02d}.parquet")

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("railway_class", T.StringType()),
            T.StructField("rowtime", T.TimestampType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(dup_dir))
        .dropDuplicates(["event_id"])
    )
    emitted = {"rows": 0, "ids": 0}

    def sink(batch_df, batch_id):
        emitted["rows"] += batch_df.count()

    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    n_unique = (
        spark.read.schema(schema).parquet(str(dup_dir)).select("event_id").distinct().count()
    )
    assert emitted["rows"] == n_unique


def test_foreach_row_writer_buffers_flushes_and_aborts():
    """Per-record foreach sink shim (reference O2 SinkDataApiSingle): buffer →
    batched upsert flush on buffer-full and close; no commit on error."""
    from kda_flink_demo_spark.streaming.upsert import ForeachRowUpsertWriter

    class FakeCursor:
        def __init__(self, log):
            self.log = log

        def executemany(self, sql, rows):
            self.log.append(list(rows))

    class FakeConn:
        def __init__(self):
            self.log = []
            self.committed = False
            self.closed = False

        def cursor(self):
            return FakeCursor(self.log)

        def commit(self):
            self.committed = True

        def close(self):
            self.closed = True

    conns = []

    def connect():
        c = FakeConn()
        conns.append(c)
        return c

    w = ForeachRowUpsertWriter(connect, "t", ["k", "v"], ["k"], buffer_size=3)
    assert w.open(partition_id=0, epoch_id=7) is True
    for i in range(7):
        w.process({"k": i, "v": i})
    w.close(None)
    con = conns[-1]
    assert [len(c) for c in con.log] == [3, 3, 1]
    assert con.committed and con.closed

    # error path: buffered rows are NOT committed
    w2 = ForeachRowUpsertWriter(connect, "t", ["k", "v"], ["k"], buffer_size=10)
    w2.open(0, 8)
    w2.process({"k": 1, "v": 1})
    w2.close(RuntimeError("boom"))
    con2 = conns[-1]
    assert con2.log == [] and not con2.committed and con2.closed


@pytest.fixture(scope="module")
def replay_full_dir(spark, tmp_path_factory):
    """Full-column events replay (user_id/value kept) for the join tests."""
    out = str(tmp_path_factory.mktemp("events_replay_full"))
    ev = load_table(spark, SF_DIR, "events").orderBy("ts")
    rows = ev.collect()
    chunk = (len(rows) + 4) // 5
    for i in range(5):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, ev.schema).coalesce(1).write.parquet(f"{out}/chunk={i:02d}")
    return out


def _full_stream(spark, replay_full_dir):
    schema = load_table(spark, SF_DIR, "events").schema
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(replay_full_dir + "/chunk=*")
    )


def test_stream_static_enrichment_matches_batch(spark, replay_full_dir, tmp_path):
    """Stream-static join: per-micro-batch broadcast of a dimension table into
    the stream (the standard enrichment pattern — dim lookups never shuffle the
    stream side)."""
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue")],
        "event_type string, category string",
    )
    enriched = (
        _full_stream(spark, replay_full_dir)
        .join(F.broadcast(dim), "event_type")
        .select("event_id", "category")
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {(r.event_id, r.category) for r in spark.sql("SELECT * FROM enrich_out").collect()}
    want = {
        (r.event_id, r.category)
        for r in load_table(spark, SF_DIR, "events").join(dim, "event_type").select("event_id", "category").collect()
    }
    assert got == want and len(want) > 0


def test_stream_stream_interval_join_matches_batch(spark, replay_full_dir, tmp_path):
    """Stream-stream inner join with an event-time interval condition
    (view→click attribution within an hour): both sides watermarked so state
    is evictable; inner-join matches emit as they arrive, so the final result
    equals the batch join exactly."""
    s = _full_stream(spark, replay_full_dir)
    views = (
        s.filter(F.col("event_type") == "view")
        .select("user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "90 minutes")
    )
    clicks = (
        s.filter(F.col("event_type") == "click")
        .select("user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "90 minutes")
    )
    joined = views.join(
        clicks,
        (views.user_id == clicks.user_id)
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 60 MINUTES")),
    ).select("view_id", "click_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_attrib"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {(r.view_id, r.click_id) for r in spark.sql("SELECT * FROM attrib_out").collect()}
    ev = load_table(spark, SF_DIR, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    want = {
        (r.view_id, r.click_id)
        for r in v.join(
            c,
            (v.user_id == F.col("c_user_id"))
            & (F.col("click_ts") >= F.col("view_ts"))
            & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 60 MINUTES")),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_executor_staged_sink_cleans_staging_and_skips_empty(spark, tmp_path):
    """Committed staging dirs must be deleted (a long-running query's staging
    stays O(1 batch), not O(all batches)); empty micro-batches leave no
    residue either (their schema-only staging is cleaned like any other —
    deliberately no isEmpty() pre-check, which would re-execute every
    non-empty batch's plan a second time)."""
    import os

    from kda_flink_demo_spark.streaming.upsert import ExecutorStagedUpsertSink

    staging = str(tmp_path / "staging3")
    sink = ExecutorStagedUpsertSink(
        str(tmp_path / "exec_sink3.duckdb"),
        "t",
        ["k"],
        "k BIGINT, v BIGINT",
        staging_dir=staging,
    )
    sink(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"), batch_id=0)
    sink(spark.createDataFrame([(2, 21)], "k long, v long"), batch_id=1)
    assert not os.path.exists(os.path.join(staging, "batch_id=0"))
    assert not os.path.exists(os.path.join(staging, "batch_id=1"))
    empty = spark.createDataFrame([], "k long, v long")
    sink(empty, batch_id=2)
    assert not os.path.exists(os.path.join(staging, "batch_id=2"))
    cols, rows = sink.read_all()
    assert dict((r[cols.index("k")], r[cols.index("v")]) for r in rows) == {1: 10, 2: 21}


def test_upsert_sink_all_key_columns_does_nothing_on_conflict(spark, tmp_path):
    """A sink whose every column is a key (distinct-keys/dedup sink) must emit
    ON CONFLICT DO NOTHING — 'DO UPDATE SET' with an empty column list is a
    SQL syntax error."""
    sink = DuckDBUpsertSink(str(tmp_path / "allkey.duckdb"), "seen", ["k"], "k BIGINT")
    sink(spark.createDataFrame([(1,), (2,)], "k long"), batch_id=0)
    sink(spark.createDataFrame([(2,), (3,)], "k long"), batch_id=1)  # 2 conflicts
    cols, rows = sink.read_all()
    assert sorted(r[0] for r in rows) == [1, 2, 3]


def test_streaming_session_windows_match_batch(spark, replay_dir, tmp_path):
    """W6 streaming twin: session_window works under a 0-second watermark in
    append mode; every session the stream closes must equal the batch
    sessionization of the same events. (Still-open trailing sessions only
    emit on EOS, so compare on the intersection with near-complete coverage,
    as in the tumbling test.)"""
    from kda_flink_demo_spark.operators.windows import session_counts

    sink = DuckDBUpsertSink(
        str(tmp_path / "sink_sess.duckdb"),
        "sessions",
        ["railway_class", "window_start"],
        TUMBLING_SINK_SCHEMA_SESS,
    )
    stream = _stream(spark, replay_dir).withWatermark("rowtime", "0 seconds")
    result = session_counts(stream, gap="5 minutes").select(
        "railway_class", "railway_class_count", "window_start", "window_end"
    )
    _run(spark, result, sink, str(tmp_path / "ckpt_sess"))

    cols, got = sink.read_all()
    batch = session_counts(
        load_table(spark, SF_DIR, "events").select(
            F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
        ),
        gap="5 minutes",
    )
    expected = {
        (r.railway_class, r.window_start): (r.window_end, r.railway_class_count)
        for r in batch.collect()
    }
    got_map = {
        (r[cols.index("railway_class")], r[cols.index("window_start")]): (
            r[cols.index("window_end")],
            r[cols.index("railway_class_count")],
        )
        for r in got
    }
    assert got_map, "stream should close at least one session"
    # trailing open sessions (one per key at most) may be missing
    n_keys = len({k for k, _ in expected})
    assert len(got_map) >= len(expected) - n_keys
    for k, v in got_map.items():
        assert expected[k] == v, f"session {k}: stream={v} batch={expected[k]}"


def test_streaming_count_windows_match_batch(spark, tmp_path):
    """Count-window streaming twin (Flink countWindow): closed streaming
    windows must EXACTLY equal the batch query's full windows — count windows
    close on arrival of the size-th event, so nothing waits on the watermark;
    only the final partial per key stays in state."""
    from pyspark.sql import types as T

    from kda_flink_demo_spark.streaming.count_windows import count_windows_stream

    ev = (
        load_table(spark, SF_DIR, "events")
        .select(
            "event_id",
            F.col("event_type").alias("railway_class"),
            F.col("ts").alias("rowtime"),
            "value",
        )
        .orderBy("rowtime", "event_id")
    )
    rows = ev.collect()
    replay = str(tmp_path / "replay_vals")
    chunk = (len(rows) + 4) // 5
    for i in range(5):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, ev.schema).coalesce(1).write.parquet(
                f"{replay}/chunk={i:02d}"
            )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("railway_class", T.StringType()),
            T.StructField("rowtime", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(replay + "/chunk=*")
    )
    result = count_windows_stream(stream, size=100)
    sink = DuckDBUpsertSink(
        str(tmp_path / "sink_cw.duckdb"),
        "count_windows",
        ["railway_class", "window_id"],
        "railway_class VARCHAR, window_id BIGINT, railway_class_count BIGINT, sum_value DOUBLE",
    )
    _run(spark, result, sink, str(tmp_path / "ckpt_cw"))

    cols, got = sink.read_all()
    got_map = {
        (r[cols.index("railway_class")], r[cols.index("window_id")]): (
            r[cols.index("railway_class_count")],
            r[cols.index("sum_value")],
        )
        for r in got
    }
    from kda_flink_demo_spark.registry import queries

    batch = queries()["count_windows_100"](spark, SF_DIR)
    expected = {
        (r.railway_class, r.window_id): (r.railway_class_count, r.sum_value)
        for r in batch.collect()
        if r.railway_class_count == 100  # full windows only
    }
    assert got_map, "stream should close at least one window"
    assert got_map == expected


def test_count_windows_tws_matches_batch(spark, tmp_path):
    """The transformWithStateInPandas twin of the count-window operator
    (typed ValueState — the sliding TWS twin covers ListState) must emit
    exactly the batch query's full windows on an in-order replay. Runs
    through the protobuf shim; skips only with no shimmable protobuf."""
    from pyspark.sql import types as T

    from kda_flink_demo_spark.streaming import protobuf_compat
    from kda_flink_demo_spark.streaming.count_windows import count_windows_tws
    from kda_flink_demo_spark.streaming.jobs import use_rocksdb_state

    if not protobuf_compat.tws_available():
        pytest.skip("transformWithStateInPandas requires google.protobuf (none shimmable here)")

    ev = (
        load_table(spark, SF_DIR, "events")
        .select(
            "event_id",
            F.col("event_type").alias("railway_class"),
            F.col("ts").alias("rowtime"),
            "value",
        )
        .orderBy("rowtime", "event_id")
    )
    replay = str(tmp_path / "replay_tws_cw")
    _build_replay(spark, ev, replay)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("railway_class", T.StringType()),
            T.StructField("rowtime", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(replay + "/chunk=*")
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    use_rocksdb_state(spark)  # transformWithStateInPandas requires RocksDB
    sink = DuckDBUpsertSink(
        str(tmp_path / "sink_tws_cw.duckdb"),
        "count_windows",
        ["railway_class", "window_id"],
        "railway_class VARCHAR, window_id BIGINT, railway_class_count BIGINT, sum_value DOUBLE",
    )
    try:
        result = count_windows_tws(stream, size=100)
        _run(spark, result, sink, str(tmp_path / "ckpt_tws_cw"))
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    cols, got = sink.read_all()
    got_map = {
        (r[cols.index("railway_class")], r[cols.index("window_id")]): (
            r[cols.index("railway_class_count")],
            r[cols.index("sum_value")],
        )
        for r in got
    }
    from kda_flink_demo_spark.registry import queries

    batch = queries()["count_windows_100"](spark, SF_DIR)
    expected = {
        (r.railway_class, r.window_id): (r.railway_class_count, r.sum_value)
        for r in batch.collect()
        if r.railway_class_count == 100  # full windows only
    }
    assert got_map, "stream should close at least one window"
    assert got_map == expected


def test_session_finalize_tws_timers_match_batch(spark, tmp_path):
    """The event-time TIMER path of transformWithStateInPandas (third TWS
    operator; handleExpiredTimer + registerTimer/deleteTimer): gap sessions
    must equal the batch session_window values exactly — in-batch splits
    close deterministically in handleInputRows, idle tails flush when the
    watermark fires their timer. At most one session per key (a tail the
    final watermark never passes) may be unflushed."""
    from pyspark.sql import types as T

    from kda_flink_demo_spark.operators.windows import session_counts
    from kda_flink_demo_spark.streaming import protobuf_compat
    from kda_flink_demo_spark.streaming.jobs import use_rocksdb_state
    from kda_flink_demo_spark.streaming.session_timer import session_finalize_tws

    if not protobuf_compat.tws_available():
        pytest.skip("transformWithStateInPandas requires google.protobuf (none shimmable here)")

    gap = 120
    ev = (
        load_table(spark, SF_DIR, "events")
        .select(
            "event_id",
            F.col("event_type").alias("railway_class"),
            F.col("ts").alias("rowtime"),
        )
        .orderBy("rowtime", "event_id")
    )
    replay = str(tmp_path / "replay_sess")
    _build_replay(spark, ev, replay)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("railway_class", T.StringType()),
            T.StructField("rowtime", T.TimestampType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(replay + "/chunk=*")
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    use_rocksdb_state(spark)
    out_dir = str(tmp_path / "sess_out")
    try:
        q = (
            session_finalize_tws(stream, gap_seconds=gap)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert not q.isActive
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    got = {
        (r.railway_class, r.window_start): (r.window_end, r.railway_class_count)
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = session_counts(
        ev.select("railway_class", "rowtime"), gap=f"{gap} seconds"
    )
    expected = {
        (r.railway_class, r.window_start): (r.window_end, r.railway_class_count)
        for r in batch.collect()
    }
    n_keys = ev.select("railway_class").distinct().count()
    # every emitted session is EXACTLY a batch session
    mismatches = {k: (v, expected.get(k)) for k, v in got.items() if expected.get(k) != v}
    assert not mismatches, f"{len(mismatches)} wrong, e.g. {list(mismatches.items())[:3]}"
    # completeness: only per-key unflushed tails may be missing — and the
    # timer path must have flushed at least one idle tail (not just
    # handleInputRows splits), else the timer machinery silently never ran
    missing = set(expected) - set(got)
    assert len(missing) <= n_keys, f"{len(missing)} missing > {n_keys} keys"
    ends_by_key = {}
    for (k, _s), (e, _c) in expected.items():
        ends_by_key.setdefault(k, []).append(e)
    finals = {(k, s) for (k, s), (e, _c) in expected.items() if e == max(ends_by_key[k])}
    assert any(f in got for f in finals), "no per-key final session flushed — timers never fired"


def test_session_finalize_tws_never_regresses_session_end_on_late_events(spark, tmp_path):
    """With a nonzero watermark delay a later batch can carry an event OLDER
    than the standing session's last time. The session end must never move
    backwards: (a) a late event must not manufacture a false split when the
    next on-time event is still within the gap of the TRUE last time, and
    (b) a legit split after a late event must emit the merged session with
    the true end (r08 second-review finding)."""
    import datetime as dt

    from pyspark.sql import types as T

    from kda_flink_demo_spark.streaming import protobuf_compat
    from kda_flink_demo_spark.streaming.jobs import use_rocksdb_state
    from kda_flink_demo_spark.streaming.session_timer import session_finalize_tws

    if not protobuf_compat.tws_available():
        pytest.skip("transformWithStateInPandas requires google.protobuf (none shimmable here)")

    def ts(sec):
        return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=sec)

    schema = T.StructType(
        [
            T.StructField("railway_class", T.StringType()),
            T.StructField("rowtime", T.TimestampType()),
        ]
    )

    def run(name, chunks):
        replay = str(tmp_path / f"replay_{name}")
        for i, secs in enumerate(chunks):
            spark.createDataFrame(
                [("k", ts(s)) for s in secs], schema
            ).coalesce(1).write.parquet(f"{replay}/chunk={i:02d}")
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(replay + "/chunk=*")
        )
        out_dir = str(tmp_path / f"out_{name}")
        prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        use_rocksdb_state(spark)
        try:
            q = (
                session_finalize_tws(
                    stream, gap_seconds=300, watermark_delay="10 minutes"
                )
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
        finally:
            if prev:
                spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
            else:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        return spark.read.parquet(out_dir).collect()

    # (a) late 900s between 1000s and 1250s: 1250 - TRUE last (1000) = 250s
    # < gap — one merged session, still open at stream end → NO emission
    # (the pre-fix code regressed last to 900 and emitted a false split)
    assert run("false_split", [[1000], [900], [1250]]) == []

    # (b) late 900s then a 2000s event: legit split — the closed session is
    # the MERGED one (start 900, end = true last 1000 + gap, count 2)
    got = run("legit_split", [[1000], [900, 2000]])
    assert len(got) == 1
    r = got[0]
    assert r.railway_class == "k"
    assert r.railway_class_count == 2
    assert r.window_start == ts(900)
    assert r.window_end == ts(1300)


def test_session_tail_flush_contract(spark, tmp_path):
    """The terminal-tail contract (README divergence note, r10 verdict
    directive 7): a key's LAST session stays open at query stop — Spark's
    watermark never passes the final event, so its timer can never fire and
    flushing from close() would double-emit on replay. A heartbeat that DOES
    advance the watermark past last+gap (any later event, any key) flushes
    the tail exactly once through the normal timer path."""
    import datetime as dt

    from pyspark.sql import types as T

    from kda_flink_demo_spark.streaming import protobuf_compat
    from kda_flink_demo_spark.streaming.jobs import use_rocksdb_state
    from kda_flink_demo_spark.streaming.session_timer import session_finalize_tws

    if not protobuf_compat.tws_available():
        pytest.skip("transformWithStateInPandas requires google.protobuf (none shimmable here)")

    def ts(sec):
        return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=sec)

    schema = T.StructType(
        [
            T.StructField("railway_class", T.StringType()),
            T.StructField("rowtime", T.TimestampType()),
        ]
    )

    def run(name, chunks):
        replay = str(tmp_path / f"replay_{name}")
        for i, rows in enumerate(chunks):
            spark.createDataFrame(
                [(k, ts(s)) for k, s in rows], schema
            ).coalesce(1).write.parquet(f"{replay}/chunk={i:02d}")
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(replay + "/chunk=*")
        )
        out_dir = str(tmp_path / f"out_{name}")
        prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        use_rocksdb_state(spark)
        try:
            q = (
                session_finalize_tws(stream, gap_seconds=120)
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
        finally:
            if prev:
                spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
            else:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        return {
            (r.railway_class, r.window_start): (r.window_end, r.railway_class_count)
            for r in spark.read.parquet(out_dir).collect()
        }

    # without a heartbeat: the in-batch split closes session 1 ({0,10} →
    # end 130), the tail {200} stays open forever — exactly one emission
    got = run("no_heartbeat", [[("A", 0), ("A", 10), ("A", 200)]])
    assert got == {("A", ts(0)): (ts(130), 2)}

    # heartbeats on an UNRELATED key advance the watermark past 200+120:
    # A's tail flushes exactly once via handleExpiredTimer (batch 3 runs with
    # batch 2's watermark, so the heartbeat needs a successor batch), and the
    # heartbeat key's own tail now holds the contract's open slot
    got = run(
        "heartbeat",
        [
            [("A", 0), ("A", 10), ("A", 200)],
            [("B", 321)],
            [("B", 322)],
        ],
    )
    assert got == {
        ("A", ts(0)): (ts(130), 2),
        ("A", ts(200)): (ts(320), 1),
    }


def test_distinct_users_tws_mapstate_matches_batch(spark, replay_dir, tmp_path):
    """The MapState member of the TWS family (point containsKey/updateValue
    per user — never an iteration of the whole map): per-key exact distinct
    users upserted each micro-batch must converge to the batch
    COUNT(DISTINCT user_id) per type, and total_events to COUNT(*)."""
    from kda_flink_demo_spark.streaming import protobuf_compat
    from kda_flink_demo_spark.streaming.distinct_state import distinct_users_tws
    from kda_flink_demo_spark.streaming.jobs import use_rocksdb_state

    if not protobuf_compat.tws_available():
        pytest.skip("transformWithStateInPandas requires google.protobuf (none shimmable here)")

    ev = load_table(spark, SF_DIR, "events")
    # replay_dir carries (event_id, railway_class, rowtime); this op also
    # needs user_id — build its own 5-chunk in-order replay
    src = ev.select(
        F.col("event_type").alias("railway_class"),
        F.col("user_id"),
        F.col("ts").alias("rowtime"),
    ).orderBy("rowtime")
    replay = str(tmp_path / "replay_users")
    _build_replay(spark, src, replay)
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("railway_class", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("rowtime", T.TimestampType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(replay + "/chunk=*")
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    use_rocksdb_state(spark)
    sink = DuckDBUpsertSink(
        str(tmp_path / "sink_du.duckdb"),
        "distinct_users",
        ["railway_class"],
        "railway_class VARCHAR, distinct_users BIGINT, total_events BIGINT",
    )
    try:
        q = (
            distinct_users_tws(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt_du"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert not q.isActive
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    cols, got = sink.read_all()
    got_map = {
        r[cols.index("railway_class")]: (
            r[cols.index("distinct_users")],
            r[cols.index("total_events")],
        )
        for r in got
    }
    expected = {
        r.event_type: (r.du, r.n)
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("du"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got_map == expected


def test_streaming_ingest_dedup_matches_batch(spark, tmp_path):
    """Stream-static anti join (incremental-ingest exact dedup): replaying the
    incoming batch as a file stream against the static corpus index must emit
    exactly the batch anti-join's surviving doc_ids."""
    from kda_flink_demo_spark.operators.llm.dedup import ingest_dedup_against_corpus

    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    recrawl = docs.filter(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10000)
    )
    incoming = docs.filter(F.col("doc_id") >= 400).unionByName(recrawl)

    replay = tmp_path / "incoming"
    replay.mkdir()
    # three arrival chunks, duplicates interleaved with genuinely-new docs
    rows = incoming.collect()
    for i in range(3):
        spark.createDataFrame(rows[i::3], incoming.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(replay / f"chunk{i}"))

    stream = (
        spark.readStream.format("parquet")
        .schema(incoming.schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(replay) + "/chunk*")
    )
    got = set()

    def sink(batch_df, batch_id):
        got.update(r.doc_id for r in batch_df.select("doc_id").collect())

    q = (
        ingest_dedup_against_corpus(stream, corpus)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    expected = {
        r.doc_id for r in ingest_dedup_against_corpus(incoming, corpus).select("doc_id").collect()
    }
    assert expected, "fixture must leave survivors"
    assert got == expected
    # every planted re-crawl was dropped
    assert not any(i >= 10000 for i in got)




def test_drop_duplicates_within_watermark_invariants(spark, tmp_path):
    """Streaming twin of operators/event_dedup.interval_dedup: replay dense
    per-key arrivals through ``dropDuplicatesWithinWatermark`` (the watermark
    delay is the dedup horizon) and assert the contract that survives
    arbitrary within-batch processing order:
    (1) no two kept arrivals of a key are within the delay of each other —
        every kept arrival resets the key's expiry to ts+delay and a later
        keep must exceed it, so kept timestamps form a chain with gaps > delay;
    (2) every key keeps at least one arrival;
    (3) per key, the stream keeps AT MOST as many as the batch greedy chain —
        earliest-anchor greedy is the maximal such chain, any processing
        order yields a subchain-sized set."""
    import datetime as dt
    import glob
    import shutil

    from pyspark.sql import types as T

    from kda_flink_demo_spark.operators.event_dedup import interval_dedup

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in (1, 2):
        for et in ("click", "view"):
            for s in (0, 60, 120, 301, 302, 500, 700, 1000, 1302, 1400):
                rows.append((eid, uid, et, base + dt.timedelta(seconds=s + eid % 3)))
                eid += 1
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)

    # ordered replay: one file per 300 s event-time slice, one batch per file
    files_dir = tmp_path / "flat"
    files_dir.mkdir()
    for i, lo in enumerate(range(0, 1500, 300)):
        sl = df.filter(
            (F.col("ts") >= base + dt.timedelta(seconds=lo))
            & (F.col("ts") < base + dt.timedelta(seconds=lo + 300))
        )
        d = tmp_path / f"s{i:02d}"
        sl.coalesce(1).write.mode("overwrite").parquet(str(d))
        for j, f in enumerate(sorted(glob.glob(str(d / "*.parquet")))):
            shutil.copy(f, files_dir / f"f{i:02d}_{j}.parquet")

    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(files_dir))
        .withWatermark("ts", "300 seconds")  # the watermark delay IS the horizon
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    got = []

    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_wmdedup"))
        .foreachBatch(lambda b, _i: got.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert got, "stream must emit something"

    by_key = {}
    for r in got:
        by_key.setdefault((r.user_id, r.event_type), []).append(r.ts)
    greedy = {}
    for r in interval_dedup(df, interval_sec=300).collect():
        greedy.setdefault((r.user_id, r.event_type), []).append(r.ts)

    assert set(by_key) == set(greedy)  # (2): all 4 keys represented
    for key, tss in by_key.items():
        tss.sort()
        for a, b in zip(tss, tss[1:]):  # (1): chain gaps strictly > delay
            assert (b - a).total_seconds() > 300, (key, a, b)
        assert len(tss) <= len(greedy[key])  # (3): greedy is maximal


def test_stream_stream_interval_left_outer_join_emits_nulls(spark, replay_full_dir, tmp_path):
    """LEFT OUTER stream-stream interval join: a view with no click within the
    hour must eventually emit (view_id, NULL) — but only once the watermark
    has passed its join window and evicted its state. Robust assertions that
    avoid the eviction boundary: (a) matched pairs equal the batch inner
    join; (b) every unmatched view safely past the horizon (view_ts + join
    interval + watermark delay < max event ts) has emitted its NULL row;
    (c) no view emits BOTH a match and a NULL."""
    s = _full_stream(spark, replay_full_dir)
    views = (
        s.filter(F.col("event_type") == "view")
        .select("user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "30 minutes")
    )
    clicks = (
        s.filter(F.col("event_type") == "click")
        .select("user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "30 minutes")
    )
    joined = views.join(
        clicks,
        (views.user_id == clicks.user_id)
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 60 MINUTES")),
        "leftOuter",
    ).select("view_id", "click_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("outer_attrib_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_outer"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM outer_attrib_out").collect()
    got_pairs = {(r.view_id, r.click_id) for r in rows if r.click_id is not None}
    got_nulls = {r.view_id for r in rows if r.click_id is None}

    ev = load_table(spark, SF_DIR, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    batch_inner = v.join(
        c,
        (v.user_id == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 60 MINUTES")),
    )
    want_pairs = {(r.view_id, r.click_id) for r in batch_inner.collect()}
    assert got_pairs == want_pairs and len(want_pairs) > 0  # (a)

    matched_ids = {p[0] for p in want_pairs}
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    import datetime as dt

    horizon = max_ts - dt.timedelta(minutes=60 + 30 + 5)  # join + wm delay + slack
    must_null = {
        r.view_id
        for r in v.collect()
        if r.view_id not in matched_ids and r.view_ts < horizon
    }
    assert must_null, "fixture should contain safely-expired unmatched views"
    assert must_null <= got_nulls  # (b)
    assert not (got_nulls & matched_ids)  # (c)


def test_streaming_fuzzy_ingest_probe_matches_batch(spark, tmp_path):
    """Streaming near-dup ingest: incoming docs replay as a file stream; each
    micro-batch probes the PREBUILT standing corpus index via foreachBatch
    (the per-batch twin of ingest_dedup_fuzzy_probe). Survivors across the
    run must equal the batch operator on the full incoming set — per-batch
    probing is exact because each batch is checked independently against the
    same static index (no cross-batch state needed for corpus-vs-batch
    dedup)."""
    import glob
    import shutil

    from pyspark.sql import types as T

    from kda_flink_demo_spark.io.sources import load_table
    from kda_flink_demo_spark.operators.llm import dedup

    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    incoming = docs.filter(F.col("doc_id") >= 400).unionByName(
        docs.filter(F.col("doc_id") < 50).withColumn("doc_id", F.col("doc_id") + F.lit(10000))
    ).select("doc_id", "text")

    buckets, hashes = dedup.build_fuzzy_ingest_index(corpus)
    buckets = buckets.localCheckpoint()
    hashes = hashes.localCheckpoint()

    # replay the incoming batch as 4 files -> 4 micro-batches
    replay = tmp_path / "fuzzy_replay"
    replay.mkdir()
    for i in range(4):
        sl = incoming.filter(F.col("doc_id") % 4 == i).coalesce(1)
        d = tmp_path / f"part{i}"
        sl.write.mode("overwrite").parquet(str(d))
        for j, f in enumerate(sorted(glob.glob(str(d / "*.parquet")))):
            shutil.copy(f, replay / f"f{i}_{j}.parquet")

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    survivors = []

    def probe_batch(batch_df, _batch_id):
        out = dedup.ingest_dedup_fuzzy_probe(batch_df, buckets, hashes).select("doc_id")
        survivors.extend(r.doc_id for r in out.collect())

    q = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(replay))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_fuzzy_ingest"))
        .foreachBatch(probe_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    want = {
        r.doc_id for r in dedup.ingest_dedup_fuzzy(incoming, corpus).select("doc_id").collect()
    }
    assert sorted(survivors) == sorted(want)
    assert len(survivors) == len(set(survivors))  # each doc decided exactly once


@pytest.fixture(scope="module")
def replay_dir_anomaly(spark, tmp_path_factory):
    """events with value, globally ordered by (ts, event_id) — the batch
    operator's tie-break — chunked into 5 in-order files so the stream's
    arrival order equals the batch frame order."""
    out = str(tmp_path_factory.mktemp("events_anomaly_replay"))
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "event_type", "ts", "value")
        .orderBy("ts", "event_id")
    )
    rows = ev.collect()
    chunk = (len(rows) + 4) // 5
    for i in range(5):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, ev.schema).coalesce(1).write.parquet(
                f"{out}/chunk={i:02d}"
            )
    return out


def test_streaming_anomaly_zscore_matches_batch_exactly(
    spark, replay_dir_anomaly, tmp_path
):
    """The O(1)-state streaming z-score must equal the batch operator
    BIT-EXACTLY on an in-order replay — the state stores running cumulative
    sums continuing WindowExec's left-to-right accumulation, so every double
    (mean, var, rounded z) is the same double."""
    from pyspark.sql import types as T

    from kda_flink_demo_spark.operators.over_windows import anomaly_zscore
    from kda_flink_demo_spark.streaming.anomaly_state import anomaly_zscore_stream

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(replay_dir_anomaly + "/chunk=*")
    )
    sink = DuckDBUpsertSink(
        str(tmp_path / "anom.duckdb"),
        "anomalies",
        ["event_id"],
        "event_id BIGINT, event_type VARCHAR, ts TIMESTAMP, value DOUBLE, zscore DOUBLE",
    )
    _run(spark, anomaly_zscore_stream(stream), sink, str(tmp_path / "ckpt_anom"))

    cols, got = sink.read_all()
    batch = anomaly_zscore(load_table(spark, SF_DIR, "events"))
    expected = {r.event_id: (r.event_type, r.value, r.zscore) for r in batch.collect()}
    got_map = {
        r[cols.index("event_id")]: (
            r[cols.index("event_type")],
            r[cols.index("value")],
            r[cols.index("zscore")],
        )
        for r in got
    }
    assert got_map == expected


def test_streaming_anomaly_state_survives_crash_recovery(
    spark, replay_dir_anomaly, tmp_path
):
    """Custom-stateful exactly-once: kill the anomaly query after ≥1 committed
    micro-batch, restart from the checkpoint, drain — the recovered
    applyInPandasWithState ring state must continue the cumulative sums so the
    final sink still equals the batch operator EXACTLY (a lost or replayed
    state update would shift every downstream frame's sums)."""
    import time

    from pyspark.sql import types as T

    from kda_flink_demo_spark.operators.over_windows import anomaly_zscore
    from kda_flink_demo_spark.streaming.anomaly_state import anomaly_zscore_stream

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def stream():
        return (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(replay_dir_anomaly + "/chunk=*")
        )

    sink = DuckDBUpsertSink(
        str(tmp_path / "anom_crash.duckdb"),
        "anomalies",
        ["event_id"],
        "event_id BIGINT, event_type VARCHAR, ts TIMESTAMP, value DOUBLE, zscore DOUBLE",
    )
    ckpt = str(tmp_path / "anom_crash_ckpt")

    q = (
        anomaly_zscore_stream(stream())
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in (q.recentProgress or [])):
            break
        time.sleep(0.5)
    q.stop()

    q2 = jobs.run_to_sink(anomaly_zscore_stream(stream()), sink, ckpt)
    q2.awaitTermination(300)
    cols, got = sink.read_all()

    batch = anomaly_zscore(load_table(spark, SF_DIR, "events"))
    expected = {r.event_id: (r.event_type, r.value, r.zscore) for r in batch.collect()}
    got_map = {
        r[cols.index("event_id")]: (
            r[cols.index("event_type")],
            r[cols.index("value")],
            r[cols.index("zscore")],
        )
        for r in got
    }
    assert got_map == expected


def test_streaming_bloom_ingest_probe_matches_batch(spark, tmp_path):
    """Streaming exact ingest dedup on the Bloom standing index: incoming docs
    replay as a file stream, each micro-batch probes the PREBUILT word table +
    corpus hash projection via foreachBatch. Survivors across the run must
    equal the one-shot batch anti join on the full incoming set."""
    import glob
    import shutil

    from pyspark.sql import types as T

    from kda_flink_demo_spark.operators.llm import dedup

    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    incoming = (
        docs.filter(F.col("doc_id") >= 400)
        .unionByName(
            docs.filter(F.col("doc_id") < 50).withColumn(
                "doc_id", F.col("doc_id") + F.lit(10000)
            )
        )
        .select("doc_id", "text")
    )

    bloom = dedup.bloom_build(corpus).localCheckpoint()
    corpus_hashes = corpus.select(F.xxhash64(F.col("text")).alias("_h")).localCheckpoint()

    replay = tmp_path / "bloom_replay"
    replay.mkdir()
    for i in range(4):
        sl = incoming.filter(F.col("doc_id") % 4 == i).coalesce(1)
        d = tmp_path / f"bpart{i}"
        sl.write.mode("overwrite").parquet(str(d))
        for j, f in enumerate(sorted(glob.glob(str(d / "*.parquet")))):
            shutil.copy(f, replay / f"f{i}_{j}.parquet")

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    survivors = []

    def probe_batch(batch_df, _batch_id):
        out = dedup.ingest_dedup_bloom_probe(batch_df, bloom, corpus_hashes).select(
            "doc_id"
        )
        survivors.extend(r.doc_id for r in out.collect())

    q = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(replay))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_bloom_ingest"))
        .foreachBatch(probe_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive

    expected = {
        r.doc_id
        for r in dedup.ingest_dedup_against_corpus(incoming, corpus).select("doc_id").collect()
    }
    assert sorted(survivors) == sorted(expected)


def test_streaming_sketch_store_equals_one_pass(spark, tmp_path):
    """Streaming sketch maintenance: fold each micro-batch into the standing
    per-key sketch store; after the replay the store's report must equal the
    one-pass batch sketch BIT-EXACTLY (HLL/Theta unions are associative and
    commutative), including after a duplicate-batch replay (idempotent merge)."""
    import glob
    import shutil

    from pyspark.sql import types as T

    from kda_flink_demo_spark.operators.sketches import (
        sketch_report,
        sketch_state,
        update_sketch_store,
    )

    ev_src = load_table(spark, SF_DIR, "events").select("event_id", "event_type", "user_id")
    replay = tmp_path / "sketch_replay"
    replay.mkdir()
    for i in range(4):
        d = tmp_path / f"spart{i}"
        ev_src.filter(F.col("event_id") % 4 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d))
        for j, f in enumerate(sorted(glob.glob(str(d / "*.parquet")))):
            shutil.copy(f, replay / f"f{i}_{j}.parquet")

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    store = str(tmp_path / "sketch_store")
    seen_batches = []

    def fold(batch_df, batch_id):
        update_sketch_store(batch_df, store)
        seen_batches.append(batch_id)

    q = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(replay))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sketch"))
        .foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(seen_batches) >= 2  # actually replayed incrementally

    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    got = canon(sketch_report(spark.read.parquet(store)))
    ev = load_table(spark, SF_DIR, "events")
    expected = canon(sketch_report(sketch_state(ev)))
    assert got == expected

    # replaying an already-folded slice must not change the state (idempotent)
    update_sketch_store(ev.filter(F.col("event_id") % 5 == 0), store)
    assert canon(sketch_report(spark.read.parquet(store))) == expected


def test_streaming_session_windows_match_batch(spark, replay_dir, tmp_path):
    """W6 streaming twin: closed sessions emitted by the streaming
    session_window aggregate must equal the batch session values; sessions
    still open at end of replay stay in state (append-mode semantics)."""
    from kda_flink_demo_spark.operators.windows import session_counts

    sink = DuckDBUpsertSink(
        str(tmp_path / "sess.duckdb"),
        "sessions",
        jobs.TUMBLING_SINK_KEYS,
        jobs.TUMBLING_SINK_SCHEMA,
    )
    result = jobs.job_session(_stream(spark, replay_dir), gap="5 minutes")
    _run(spark, result, sink, str(tmp_path / "ckpt_sess"))

    cols, got = sink.read_all()
    batch = session_counts(
        load_table(spark, SF_DIR, "events").select(
            F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
        ),
        gap="5 minutes",
    )
    expected = {
        (r.railway_class, r.window_start, r.window_end): r.railway_class_count
        for r in batch.collect()
    }
    got_map = {
        (r[cols.index("railway_class")], r[cols.index("window_start")], r[cols.index("window_end")]):
        r[cols.index("railway_class_count")]
        for r in got
    }
    # every emitted (closed) session must match its batch twin exactly, and
    # only the per-key final (still-open) sessions may be missing
    n_keys = len({k[0] for k in expected})
    assert len(got_map) >= len(expected) - n_keys
    for k, v in got_map.items():
        assert expected[k] == v, f"session {k}: stream={v} batch={expected[k]}"


def test_streaming_interval_join_matches_batch_exactly(spark, tmp_path):
    """Stream-stream interval join: with watermark delay = join bound, no
    in-bound partner is ever evicted early, so the bounded-replay inner join
    equals the batch join EXACTLY (not just on an intersection)."""
    from pyspark.sql import types as T

    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "event_type", "ts")
    rows = ev.orderBy("ts").collect()
    out = str(tmp_path / "events_replay")
    chunk = max(1, len(rows) // 4)
    for i in range(4):
        part = rows[i * chunk : (i + 1) * chunk] if i < 3 else rows[3 * chunk :]
        if part:
            spark.createDataFrame(part, ev.schema).coalesce(1).write.parquet(
                f"{out}/chunk={i:02d}"
            )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )

    def _src():
        return (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(out + "/chunk=*")
        )

    bound = 1800
    stream_result = jobs.job_interval_join(
        _src().filter(F.col("event_type") == "view"),
        _src().filter(F.col("event_type") == "purchase"),
        bound_seconds=bound,
    )
    collected = []

    def sink(batch_df, _bid):
        collected.extend(tuple(r) for r in batch_df.collect())

    q = (
        stream_result.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ij"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive

    batch = jobs.job_interval_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        bound_seconds=bound,
    )
    expected = sorted(tuple(r) for r in batch.collect())
    assert len(expected) > 0, "fixture must produce at least one join match"
    assert sorted(collected) == expected


def test_streaming_dedup_drops_replayed_duplicates_exactly(spark, tmp_path):
    """Streaming exact dedup (dropDuplicatesWithinWatermark): a replay where
    each chunk re-emits the tail of the previous one (at-least-once
    redelivery) must yield EXACTLY the batch dropDuplicates result — one copy
    per event_id, first-seen values — because every duplicate arrives inside
    the dedup horizon."""
    from pyspark.sql import types as T

    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", F.col("event_type").alias("railway_class"),
                F.col("ts").alias("rowtime"))
        .orderBy("rowtime")
    )
    rows = ev.collect()
    out = str(tmp_path / "dup_replay")
    n = len(rows)
    chunk = (n + 3) // 4
    overlap = 25
    for i in range(4):
        part = rows[i * chunk : (i + 1) * chunk]
        if i > 0:  # redeliver the previous chunk's tail
            part = rows[max(0, i * chunk - overlap) : i * chunk] + part
        if part:
            spark.createDataFrame(part, ev.schema).coalesce(1).write.parquet(
                f"{out}/chunk={i:02d}"
            )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("railway_class", T.StringType()),
            T.StructField("rowtime", T.TimestampType()),
        ]
    )
    src = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(out + "/chunk=*")
    )
    result = jobs.job_dedup(src, keys=("event_id",), delay="48 hours")
    collected = []

    def sink(batch_df, _bid):
        collected.extend(tuple(r) for r in batch_df.collect())

    q = (
        result.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive

    expected = sorted(tuple(r) for r in rows)  # fixture event_ids are unique
    assert len(collected) == len(expected), "a duplicate survived or a row was lost"
    assert sorted(collected) == expected
