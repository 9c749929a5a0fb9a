"""Unit semantics for the as-of backward join (operators/asof.py): inclusive vs
strict boundary handling, no-match NULLs, and per-key isolation — on a tiny
hand-built frame where every expected match is enumerable. The registry-level
oracle check (asof_join_last_purchase vs DuckDB's native ASOF JOIN) covers the
at-scale behavior."""

from __future__ import annotations

from datetime import datetime

from kda_flink_demo_spark.operators.asof import asof_join_backward


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_strict(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:00:05")),
            (2, 10, _ts("2024-01-01T00:00:10")),  # exactly at a right row
            (3, 10, _ts("2024-01-01T00:00:02")),  # before any right row
            (4, 20, _ts("2024-01-01T00:00:30")),  # other key
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T00:00:04"), 100),
            (10, _ts("2024-01-01T00:00:10"), 101),
            (20, _ts("2024-01-01T00:00:29"), 200),
        ],
        "user_id long, rts timestamp, rid long",
    )

    inclusive = {
        r.event_id: r.rid
        for r in asof_join_backward(
            left, right, on="user_id", left_ts="ts", right_ts="rts", payload_cols=["rid"]
        ).collect()
    }
    assert inclusive == {1: 100, 2: 101, 3: None, 4: 200}

    strict = {
        r.event_id: r.rid
        for r in asof_join_backward(
            left,
            right,
            on="user_id",
            left_ts="ts",
            right_ts="rts",
            payload_cols=["rid"],
            inclusive=False,
        ).collect()
    }
    # at the exact boundary the right row is no longer visible
    assert strict == {1: 100, 2: 100, 3: None, 4: 200}


def test_asof_single_shuffle_plan(spark):
    """The implementation must stay one hash shuffle on the key (union +
    window), never a nested-loop inequality join."""
    left = spark.range(10).selectExpr(
        "id AS event_id", "id % 3 AS user_id", "timestamp_micros(CAST(id * 1000000 AS LONG)) AS ts"
    )
    right = spark.range(5).selectExpr(
        "id % 3 AS user_id", "timestamp_micros(CAST(id * 900000 AS LONG)) AS rts", "id AS rid"
    )
    df = asof_join_backward(
        left, right, on="user_id", left_ts="ts", right_ts="rts", payload_cols=["rid"]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") >= 1


def test_asof_null_right_timestamp_never_matches(spark):
    """A right row with NULL timestamp is not 'the most recent row at or before
    t' under ASOF semantics (NULL-false comparison); it must not back-fill
    early left rows via nulls-first ordering."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T00:00:08"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, None, 999), (10, _ts("2024-01-01T00:00:09"), 100)],
        "user_id long, rts timestamp, rid long",
    )
    out = {
        r.event_id: r.rid
        for r in asof_join_backward(
            left, right, on="user_id", left_ts="ts", right_ts="rts", payload_cols=["rid"]
        ).collect()
    }
    assert out == {1: None}  # not 999: the NULL-ts row is no match


def test_cdc_apply_changes_idempotent_and_delete_wins(spark):
    """Replaying the same change set over an already-merged base is a no-op;
    a delete sequenced after an upsert removes the key."""
    from kda_flink_demo_spark.operators.cdc import apply_changes

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, s string, v double"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 22.0, "U", 1),  # update key 2
            (3, "c", 30.0, "D", 1),   # delete key 3
            (4, "d", 40.0, "U", 1),   # insert key 4
            (4, "d", 40.0, "D", 2),   # ... then delete it again
        ],
        "k int, s string, v double, op string, seq int",
    )
    merged = apply_changes(base, changes, keys=["k"])
    got = {(r.k, r.s, r.v) for r in merged.collect()}
    assert got == {(1, "a", 10.0), (2, "b2", 22.0)}
    # idempotence: applying the same changes onto the merged result is stable
    again = apply_changes(merged, changes, keys=["k"])
    assert {(r.k, r.s, r.v) for r in again.collect()} == got


def test_asof_forward_inclusive_and_strict(spark):
    """Forward mirror: smallest right ts ≥ (inclusive) / > (strict) the left
    ts; NULL after the last right row; exact-tie rows visible only when
    inclusive."""
    from kda_flink_demo_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:00:05")),
            (2, 10, _ts("2024-01-01T00:00:10")),  # exactly at a right row
            (3, 10, _ts("2024-01-01T00:00:12")),  # after the last right row
            (4, 20, _ts("2024-01-01T00:00:28")),  # other key
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T00:00:04"), 100),
            (10, _ts("2024-01-01T00:00:10"), 101),
            (20, _ts("2024-01-01T00:00:29"), 200),
        ],
        "user_id long, rts timestamp, rid long",
    )

    inclusive = {
        r.event_id: r.rid
        for r in asof_join_forward(
            left, right, on="user_id", left_ts="ts", right_ts="rts", payload_cols=["rid"]
        ).collect()
    }
    assert inclusive == {1: 101, 2: 101, 3: None, 4: 200}

    strict = {
        r.event_id: r.rid
        for r in asof_join_forward(
            left,
            right,
            on="user_id",
            left_ts="ts",
            right_ts="rts",
            payload_cols=["rid"],
            inclusive=False,
        ).collect()
    }
    # at the exact boundary the right row is no longer visible
    assert strict == {1: 101, 2: None, 3: None, 4: 200}


def test_asof_fuzz_vs_pandas_merge_asof(spark):
    """Seeded-random corpora vs pandas merge_asof — an INDEPENDENT third
    implementation of as-of semantics (direction backward/forward,
    allow_exact_matches = inclusive/strict). Right (key, ts) pairs are unique
    per trial (exact-tie right rows are undefined order in every asof engine;
    the registered queries pre-dedup them the same way)."""
    import datetime as dt
    import random

    import pandas as pd

    from kda_flink_demo_spark.operators.asof import asof_join_backward, asof_join_forward

    base = dt.datetime(2024, 1, 1)
    rng = random.Random(4242)
    for trial in range(3):
        keys = [rng.randrange(4) for _ in range(120)]
        lts = [rng.randrange(500) for _ in range(120)]
        left_rows = [
            (i, k, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(zip(keys, lts))
        ]
        right_pairs = set()
        while len(right_pairs) < 60:
            right_pairs.add((rng.randrange(4), rng.randrange(500)))
        right_rows = [
            (k, base + dt.timedelta(seconds=s), 1000 + j)
            for j, (k, s) in enumerate(sorted(right_pairs))
        ]
        left = spark.createDataFrame(left_rows, "event_id long, k long, ts timestamp")
        right = spark.createDataFrame(right_rows, "k long, rts timestamp, rid long")
        lpd = pd.DataFrame(left_rows, columns=["event_id", "k", "ts"]).sort_values("ts", kind="mergesort")
        rpd = pd.DataFrame(right_rows, columns=["k", "rts", "rid"]).sort_values("rts", kind="mergesort")

        for direction, fn in (("backward", asof_join_backward), ("forward", asof_join_forward)):
            for inclusive in (True, False):
                got = {
                    r.event_id: r.rid
                    for r in fn(
                        left, right, on="k", left_ts="ts", right_ts="rts",
                        payload_cols=["rid"], inclusive=inclusive,
                    ).collect()
                }
                ref = pd.merge_asof(
                    lpd, rpd, left_on="ts", right_on="rts", by="k",
                    direction=direction, allow_exact_matches=inclusive,
                )
                want = {
                    int(r.event_id): (None if pd.isna(r.rid) else int(r.rid))
                    for r in ref.itertuples()
                }
                assert got == want, (trial, direction, inclusive)
