"""Change-data-capture apply: merge a stream/batch of keyed changes
(upserts + deletes) onto a base snapshot — the Delta/Iceberg ``MERGE INTO``
pattern, expressed engine-agnostically as union + latest-wins window.

Scale notes: one shuffle on the merge key (the window partition); both inputs
are scanned once; no driver involvement. On a real lakehouse the same logic is
what ``MERGE INTO`` compiles to when the change set is too big to broadcast —
for small change sets Spark/AQE broadcasts the changes side of an equivalent
outer-join formulation, but the union+window form wins when changes ≈ base
(full-history replay, backfill) because it avoids the join entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Latest-wins CDC merge.

    ``changes`` carries the base columns plus ``op_col`` ('U' upsert /
    'D' delete) and a monotonically increasing ``seq_col`` (change order;
    base rows rank below every change at seq 0). Per key, the highest-seq row
    wins; a winning delete removes the key. Ties on (key, seq) are broken by
    preferring the change row over base (op desc puts 'U'/'D' after 'I') so
    replaying a change set over an already-merged base is idempotent.
    """
    base_cols = base.columns
    b = base.withColumn(op_col, F.lit("I")).withColumn(seq_col, F.lit(0).cast("long"))
    c = changes.select(*base_cols, op_col, F.col(seq_col).cast("long").alias(seq_col))
    merged = b.unionByName(c)
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc(), F.col(op_col).desc())
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != "D"))
        .select(*base_cols)
    )


def scd2_compress(
    changes: DataFrame,
    keys: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str = "ts",
    tie_col: str | None = None,
) -> DataFrame:
    """The compression half of SCD2: drop consecutive rows whose tracked
    attributes are unchanged (NULL-safe lag compare), keeping only real
    transitions. Idempotent — re-compressing kept rows (or kept rows unioned
    with exact duplicates of them) returns the same set, which is what makes
    the streaming SCD2 store's replayed batches harmless."""
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    unchanged = F.lit(True)
    for a in attr_cols:
        unchanged = unchanged & F.col(a).eqNullSafe(F.lag(a).over(w))
    return (
        changes.withColumn("_first", F.row_number().over(w) == 1)
        .withColumn("_same", unchanged)
        .filter(F.col("_first") | ~F.col("_same"))
        .drop("_first", "_same")
    )


def temporal_join(
    facts: DataFrame,
    history: DataFrame,
    keys: Sequence[str],
    fact_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    attr_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Point-in-time (temporal) join: each fact row picks up the dimension
    attributes that were valid AT its event time — ``valid_from <= ts <
    valid_to`` (NULL valid_to = still open) against an SCD2 history table
    (:func:`scd2_history` output). This is the feature-store correctness
    join: joining "current" attributes onto historical facts leaks the
    future into training data; the validity-interval join cannot.

    LEFT join — facts before a key's first transition keep NULL attributes
    (there was no state yet). SCD2 intervals are disjoint per key by
    construction, so each fact matches at most one history row and the fact
    count is preserved (asserted in tests).

    Scale shape: an equi join on the key with the interval predicate as a
    join filter — one hash shuffle on the key (or broadcast when the history
    side is dimension-sized); never a cross product, because the equality on
    ``keys`` drives the join and the range condition only filters matches.
    """
    clash = sorted(set(attr_cols) & set(facts.columns))
    if clash:
        raise ValueError(
            f"temporal_join: attribute column(s) {clash} collide with fact "
            "columns — rename them on the history side first (e.g. "
            '.withColumnRenamed("event_type", "state_at_event")); a duplicate '
            "output column would make every downstream reference ambiguous"
        )
    h = history.select(
        *[F.col(k).alias(f"_h_{k}") for k in keys],
        *attr_cols,
        F.col(valid_from).alias("_vf"),
        F.col(valid_to).alias("_vt"),
    )
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_h_{k}"))
    cond = (
        cond
        & (F.col(fact_ts) >= F.col("_vf"))
        & (F.col("_vt").isNull() | (F.col(fact_ts) < F.col("_vt")))
    )
    return facts.join(h, cond, "left").drop(
        *[f"_h_{k}" for k in keys], "_vf", "_vt"
    )


def scd2_history(
    changes: DataFrame,
    keys: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str = "ts",
    tie_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 reconstruction: turn a change log into
    versioned history rows with ``valid_from`` / ``valid_to`` (half-open,
    NULL = open-ended) and an ``is_current`` flag — the warehouse pattern for
    tracking how a dimension attribute evolved.

    Consecutive rows whose tracked attributes are unchanged are compressed
    away first (:func:`scd2_compress`), so each history row is a real
    transition; ``valid_to`` is then the next KEPT change's timestamp.

    Scale shape: one hash shuffle on the key, then two in-partition window
    passes over the same sort (lag-compare for compression, lead for the
    interval close) — Catalyst plans a single Exchange + Sort feeding both
    WindowExecs, running frames only. Per-key history must fit a partition —
    dimension keys (user, product, account) are naturally fine-grained.
    """
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    kept = scd2_compress(changes, keys, attr_cols, ts_col, tie_col)
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return kept.select(
        *keys,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )
