"""Mergeable sketch state — the approximate twin of
``aggregates.agg_state/merge_agg_states`` and the brief's "novel sketch"
custom-operator category, on Spark's built-in Apache DataSketches bindings.

Why sketches at 100 TB: exact distinct counts need a second shuffle on
(group, value) and exact set intersections need a semi join of the two
member lists; sketch states are constant-size binaries that merge
ASSOCIATIVELY, so daily slices aggregate once, persist a few KB per group,
and any union/rollup of history is a cheap state merge — never a rescan.

Determinism (verified by probe, pinned by tests): HLL (register-max union)
and Theta (k-smallest-hashes union) states are partition- and
merge-order-independent — merged slice states yield BIT-IDENTICAL estimates
to a one-pass sketch. KLL quantile sketches use RANDOMIZED compaction and
are NOT run-to-run deterministic; they are therefore kept out of the
registry contract (which the determinism probe replays) and exposed only
through :func:`kll_quantile_state`, tolerance-tested locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_state(
    df: DataFrame,
    key_col: str = "event_type",
    id_col: str = "user_id",
) -> DataFrame:
    """Per-key mergeable sketch state: an HLL sketch (distinct ids) and a
    Theta sketch (set membership, enabling union/intersection/difference
    ACROSS keys or slices) — one partial→final aggregate, a few KB per key."""
    return df.groupBy(key_col).agg(
        F.hll_sketch_agg(id_col).alias("hll_state"),
        F.theta_sketch_agg(id_col).alias("theta_state"),
    )


def merge_sketch_states(*states: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Combine per-slice sketch states into the state of the union of their
    inputs — same incremental-ETL shape as ``merge_agg_states``; the shuffle
    carries one constant-size binary per (slice, key). ``key_col`` must match
    the one the states were built with."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(key_col).agg(
        F.hll_union_agg("hll_state").alias("hll_state"),
        F.theta_union_agg("theta_state").alias("theta_state"),
    )


def sketch_report(
    merged: DataFrame,
    key_col: str = "event_type",
    anchor_key: str = "purchase",
) -> DataFrame:
    """Readout: per key, the HLL distinct estimate and the Theta-estimated
    overlap with ``anchor_key``'s id set (e.g. "users of this event type who
    also purchased") — the cross-set intersection that exactly would need a
    semi join of member lists, here a scalar operation on two broadcast-sized
    sketch binaries.

    The anchor is attached with a LEFT join on a constant key (not a
    crossJoin): if ``anchor_key`` is absent from the merged states the per-key
    HLL estimates must still come out, with a 0 overlap — a crossJoin against
    the then-empty anchor side would silently zero-row the whole report."""
    anchor = merged.filter(F.col(key_col) == anchor_key).select(
        F.lit(1).alias("_j"), F.col("theta_state").alias("_anchor_theta")
    )
    return (
        merged.withColumn("_j", F.lit(1))
        .join(F.broadcast(anchor), "_j", "left")
        .select(
            key_col,
            F.hll_sketch_estimate("hll_state").alias("distinct_ids"),
            F.coalesce(
                F.round(
                    F.theta_sketch_estimate(
                        F.theta_intersection("theta_state", "_anchor_theta")
                    )
                ).cast("long"),
                F.lit(0).cast("long"),
            ).alias("ids_also_in_anchor"),
        )
    )


def kll_quantile_state(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-key KLL quantile sketch state (mergeable with
    ``kll_sketch_merge_double``). Randomized compaction → NOT deterministic;
    local tests bound its rank error vs exact percentiles instead of pinning
    values. Kept out of the registry contract."""
    return df.groupBy(key_col).agg(
        F.kll_sketch_agg_double(value_col).alias("kll_state")
    )


def update_sketch_store(
    batch_df: DataFrame,
    store_path: str,
    key_col: str = "event_type",
    id_col: str = "user_id",
) -> None:
    """Streaming materialized sketch view: fold one micro-batch into a
    standing per-key sketch table (parquet at ``store_path``) — read the
    stored binaries, union-merge with the batch's fresh state, overwrite.

    Because HLL and Theta unions are associative AND commutative, the stored
    state after any replay order equals the one-pass sketch of all data seen
    — the streaming twin of `merge_sketch_states`, with the same guarantee
    the batch test pins bit-exactly. The store is a few KB per key, so the
    read-merge-overwrite cycle costs O(keys), independent of history size.
    Call from ``foreachBatch``; Spark's checkpoint replays a failed batch,
    and re-merging the same ids is IDEMPOTENT for both sketch types
    (register max / hash-set union), so a replayed batch can't corrupt the
    state.

    Crash safety (every window covered, unit-tested by fault injection) comes
    from the shared standing-store primitives —
    ``streaming/store.py``'s _SUCCESS-validated probe, ``.next`` recovery,
    and delete+rename promote; see that module's contract docstring.
    """
    from kda_flink_demo_spark.streaming.store import promote, recover_standing

    spark = batch_df.sparkSession
    fresh = sketch_state(batch_df, key_col=key_col, id_col=id_col)
    if recover_standing(spark, store_path):
        standing = spark.read.parquet(store_path.rstrip("/"))
        merged = merge_sketch_states(standing, fresh, key_col=key_col)
    else:  # first batch: no store yet
        merged = fresh
    promote(merged, store_path)
