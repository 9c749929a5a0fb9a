"""As-of joins (backward and forward) — time-series operators Spark has no
built-in for.

Semantics (backward): for every left row, attach the payload of the single
right row with the largest ``right_ts`` ≤ the left row's ``left_ts`` within
the same key (NULLs when no such row) — the trades-vs-quotes join of
kdb/Flink/Pandas ``merge_asof``. The forward join mirrors it (smallest
``right_ts`` ≥ left): event attribution's "next purchase after this click".

Spark-first implementation: NOT a range self-join (quadratic per key, and
Catalyst would plan an O(n·m) broadcast-nested-loop for the inequality).
Instead the classic union + running ``last(ignorenulls)`` window:

1. tag right rows side=0 carrying a payload struct, left rows side=1 with a
   NULL payload;
2. union and sort per key by (ts, side) — one shuffle, linear scan;
3. ``last(payload, ignorenulls=True)`` over rows UNBOUNDED PRECEDING..CURRENT
   gives every left row the most recent right payload at or before its
   timestamp; keep side=1 rows.

Cost at scale: exactly one hash shuffle on the key (same as any keyed window),
state is a single struct per partition scan — no per-pair work at all. Skewed
keys behave like any window partition (salt the key upstream if one key
dominates).

The DuckDB oracle is the native ``ASOF LEFT JOIN`` — an independent
implementation of the same semantics, which is exactly what makes it a good
cross-check. Right-side (key, ts) duplicates must be deduplicated upstream for
both engines to be deterministic (ASOF picks an arbitrary row among exact-tie
timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """Backward as-of join (see module docstring). ``payload_cols`` are the
    right-side columns attached to each left row (NULL when no match).
    ``inclusive`` matches right rows at exactly the left timestamp (ASOF
    ``>=``); ``False`` gives strict ``>``."""
    from pyspark.sql import Window

    payload = F.struct(*[F.col(c) for c in payload_cols])
    # ASOF semantics: a right row with NULL timestamp can never be "the most
    # recent row at or before t" (the comparison is NULL-false in SQL). Without
    # this filter it would sort nulls-first and back-fill every early left row.
    right = right.filter(F.col(right_ts).isNotNull())
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        payload.alias("_p"),
        F.lit(0).alias("_side"),
    )
    l = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_p", F.lit(None).cast(r.schema["_p"].dataType))
        .withColumn("_side", F.lit(1))
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    # at equal _ts: side 0 sorts first → a right row at the exact left ts is
    # visible to that left row (inclusive); flip the tag order for strict <
    side_order = F.col("_side") if inclusive else -F.col("_side")
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts"), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        merged.withColumn("_match", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return out.select(*left.columns, F.col("_match.*"))


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """Forward as-of join: for every left row, the single right row with the
    SMALLEST ``right_ts`` ≥ the left timestamp within the key (NULLs when
    none follows) — event attribution's "next purchase after this click".

    Mirror of :func:`asof_join_backward`: union-tag the sides, one shuffle on
    the key, and a REVERSE-ordered (``_ts`` DESC) running
    ``last(payload, ignorenulls=True)`` over UNBOUNDED PRECEDING..CURRENT ROW
    — deliberately NOT ``first(ignorenulls)`` over a CURRENT..FOLLOWING
    frame, whose shrinking ignore-nulls frame is O(n²) per key in Spark's
    WindowExec (see the in-body comment and
    tests/test_plan_shapes.py::test_no_shrinking_window_frames_in_fixed_operators).
    In the DESC scan an equal-timestamp right row sorts EARLIER than the left
    row when ``inclusive`` (so it is inside the left row's running frame),
    and later for strict ``<``. Same single-shuffle linear-scan cost as the
    backward join."""
    from pyspark.sql import Window

    payload = F.struct(*[F.col(c) for c in payload_cols])
    right = right.filter(F.col(right_ts).isNotNull())
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        payload.alias("_p"),
        F.lit(0).alias("_side"),
    )
    l = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_p", F.lit(None).cast(r.schema["_p"].dataType))
        .withColumn("_side", F.lit(1))
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    # "first following match" computed as a REVERSE-ordered RUNNING
    # last(ignorenulls) — NOT first(ignorenulls) over
    # CurrentRow..UnboundedFollowing, whose shrinking ignore-nulls frame makes
    # Spark's WindowExec re-scan the rest of the buffer per row (O(n²) per
    # key; same trap measured at 354 s vs 1.5 s in resample_interp). The
    # running frame is unboundedPreceding..currentRow over _ts DESC, so at
    # equal ts the right row (side 0) must sort EARLIER than the left row to
    # be inside the left row's frame when inclusive — ascending _side does
    # exactly that; strict < negates it.
    side_order = F.col("_side") if inclusive else -F.col("_side")
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").desc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        merged.withColumn("_match", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return out.select(*left.columns, F.col("_match.*"))
