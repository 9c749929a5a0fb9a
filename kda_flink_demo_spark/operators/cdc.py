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
