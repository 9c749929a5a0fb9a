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

from kda_flink_demo_spark.functions import det_round


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


def quantile_sketch_report(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    accuracy: int = 1000,
) -> DataFrame:
    """Hash-checkable quantile-sketch readout (the ``approx_distinct_report``
    template applied to the quantile family): per key, the EXACT p50/p95/p99
    (oracle-verifiable, interpolated — matches DuckDB ``quantile_cont``) plus
    per-percentile booleans asserting the Greenwald–Khanna
    ``percentile_approx`` estimate lands inside the exact quantile envelope
    ``[Q(p − ε), Q(p + ε)]`` with ε = 2/accuracy — twice GK's worst-case rank
    error of 1/accuracy, so the boolean is guaranteed by the algorithm's
    published bound and cannot flap. GK summaries are deterministic (no
    randomized compaction, unlike KLL — see ``kll_quantile_state``'s
    exclusion), so this IS registry-safe.

    The raw approximate values are deliberately NOT emitted: they are
    engine-specific (no oracle can recompute them), which is exactly what
    made ``approx_distinct_users`` rows-only for five rounds. Evidence
    columns + pinned booleans keep the row hash-checkable.

    The accuracy check verifies GK's ACTUAL published guarantee — a RANK
    bound, not a value bound: the returned value's rank interval
    [count(x < v), count(x ≤ v)] must overlap the target rank p·n within
    2n/accuracy + 1 ranks (twice the worst-case ⌈n/accuracy⌉ plus one rank
    of discrete slack, so the boolean cannot flap at any n — a value-
    envelope formulation fails at small n where ±ε spans less than one
    order statistic). The rank of the approx value is computed by a second
    conditional-count pass joined on the broadcast per-key report.

    Scale shape: the sketch itself is ONE partial→final aggregate on the
    key; GK state is O(accuracy · log n) per key and merges associatively,
    so at 100 TB the shuffle carries a bounded summary per (task, key) —
    the same constant-state story as the HLL/Theta states above, for rank
    statistics. The exact companions and the rank-verification rescan are
    the evidence cost (at true 100 TB one ships only the sketch —
    documented tradeoff, same as distinct_users_per_type vs
    approx_distinct_users); the rescan joins against the BROADCAST key-row
    report, no extra shuffle of the data side.
    """
    ps = {"p50": 0.50, "p95": 0.95, "p99": 0.99}
    pcts = ", ".join(str(p) for p in ps.values())
    base = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            det_round(F.expr(f"percentile({value_col}, {p})"), 6).alias(
                f"{name}_exact"
            )
            for name, p in ps.items()
        ],
        F.expr(f"percentile_approx({value_col}, array({pcts}), {accuracy})").alias(
            "_ap"
        ),
    )
    v = F.col(value_col)
    rank_aggs = []
    for i, name in enumerate(ps):
        ap = F.element_at("_ap", i + 1)
        rank_aggs.append(
            F.sum((v < ap).cast("long")).alias(f"_lt_{name}")
        )
        rank_aggs.append(
            F.sum((v <= ap).cast("long")).alias(f"_le_{name}")
        )
    ranks = (
        df.join(F.broadcast(base.select(key_col, "_ap")), key_col)
        .groupBy(key_col)
        .agg(*rank_aggs)
    )
    slack = 2.0 / accuracy
    cols = [F.col(key_col), F.col("n")]
    for name, p in ps.items():
        target = F.lit(p) * F.col("n")
        tol = F.lit(slack) * F.col("n") + F.lit(1.0)
        cols.append(F.col(f"{name}_exact"))
        cols.append(
            (
                (F.col(f"_lt_{name}") - tol <= target)
                & (target <= F.col(f"_le_{name}") + tol)
            ).alias(f"{name}_ok")
        )
    return base.join(ranks, key_col).select(*cols)


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
