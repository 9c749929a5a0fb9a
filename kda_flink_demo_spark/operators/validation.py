"""Declarative data-quality / constraint validation — the expectation-check
layer a production ingest pipeline runs before data reaches training or
serving (Deequ / dbt-test / Great-Expectations shape, expressed as pure
DataFrame aggregation).

Three check families, each the cheapest plan its semantics allows:

- Row rules (``column_rule_checks``): ALL rules evaluate in ONE scan as
  map-side conditional sums — adding a rule adds a column to the aggregate,
  never a pass over the data. NULL rule results count as violations
  (a rule must say TRUE to pass), so rules don't silently skip NULL rows.
- Uniqueness (``uniqueness_check``): one hash aggregate on the key;
  violations = rows beyond the first per key (count − distinct).
- Referential integrity (``referential_check``): child keys anti-joined
  against the parent key projection (broadcast when the parent is a
  dimension); SQL FK semantics — NULL child keys pass.

Every check emits the same row shape ``(check_name, n_checked,
n_violations, passed)``, so suites union into one report the oracle can
hash-check — including the violation COUNTS, not just pass/fail.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REPORT_COLS = ("check_name", "n_checked", "n_violations", "passed")


def _report(name: Column, checked: Column, violations: Column) -> list[Column]:
    return [
        name.alias("check_name"),
        checked.cast("long").alias("n_checked"),
        violations.cast("long").alias("n_violations"),
        (violations == 0).alias("passed"),
    ]


def column_rule_checks(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per rule; ``rules`` maps check_name → boolean Column that must
    be TRUE for the row to pass (NULL = violation). Single scan, map-side
    partial aggregation regardless of rule count."""
    # coalesce: sum() over ZERO rows is NULL — an empty table/partition must
    # report 0 violations / passed=TRUE (vacuous pass), not a NULL verdict
    # that neither passes nor fails a downstream filter
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.coalesce(F.sum(F.when(ok, 0).otherwise(1)), F.lit(0)).alias(f"_v{i}")
        for i, ok in enumerate(rules.values())
    ]
    one = df.agg(*aggs)
    packed = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        *_report(F.lit(name), F.col("_n"), F.col(f"_v{i}"))
                    )
                    for i, name in enumerate(rules.keys())
                ]
            )
        ).alias("r")
    )
    return packed.select(*[F.col(f"r.{c}") for c in _REPORT_COLS])


def uniqueness_check(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """Violations = rows beyond the first per key (0 for a true primary key).
    NULL-keyed rows group together, matching SQL GROUP BY (a PK column with
    NULLs therefore surfaces as duplicates, which is what you want flagged)."""
    return df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_c")).agg(
        *_report(
            F.lit(name),
            # empty input: sums over zero groups are NULL → vacuous pass
            F.coalesce(F.sum("_c"), F.lit(0)),
            F.coalesce(F.sum(F.col("_c") - 1), F.lit(0)),
        )
    )


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str,
) -> DataFrame:
    """SQL FK semantics: non-null child keys must exist in the parent; NULL
    child keys pass. One anti join on the key projections."""
    orphans = (
        child.select(F.col(child_key))
        .filter(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
    )
    n = child.agg(F.count(F.lit(1)).alias("_n"))
    v = orphans.agg(F.count(F.lit(1)).alias("_v"))
    return n.crossJoin(v).select(
        *_report(F.lit(name), F.col("_n"), F.col("_v"))
    )


def check_suite(*checks: DataFrame) -> DataFrame:
    """Union per-check reports into one suite result."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def fused_table_checks(
    df: DataFrame,
    rules: dict[str, Column],
    unique_cols: list[str],
    unique_name: str,
    fk: tuple[DataFrame, str, str, str] | None = None,
) -> DataFrame:
    """EVERY check family for one table out of ONE scan (optimization r13).

    The separate builders cost one pass each: row rules (1 scan), uniqueness
    (1 scan + key aggregate), referential integrity (1 scan for the child key
    projection + 1 scan for the row count) — four fact-table reads for what
    is semantically one. Here the rule-violation conditional sums ride the
    uniqueness key aggregate as extra per-key counters (partial aggregation
    absorbs them map-side; the shuffle still carries one row per key, just
    R+1 longs wide instead of 1), and the final global sums derive the rule
    and uniqueness rows from that single aggregate. The FK orphan count stays
    the NARROW anti-join on the child-key projection — measured: dragging the
    full row stream through a pre-groupBy membership join costs more than the
    column-pruned second read it saves (1.49 vs 1.15 s at sf0.1) — but its
    row-count denominator now comes from the fused aggregate instead of a
    third scan of the child. Net per table: 2 reads (one full-width, one
    single-column) where the separate builders paid 4.

    Emits exactly the rows the separate builders emit: one per rule, one
    uniqueness row, one FK row — bit-identical counts (asserted against the
    unfused builders in tests), with empty-input vacuous-pass semantics
    preserved (sums over zero groups coalesce to 0).

    ``fk``: optional ``(parent, child_key, parent_key, check_name)``.
    """
    per_key = [F.count(F.lit(1)).alias("_c")] + [
        F.sum(F.when(ok, 0).otherwise(1)).alias(f"_v{i}")
        for i, ok in enumerate(rules.values())
    ]
    grouped = df.groupBy(*unique_cols).agg(*per_key)
    final = [
        F.coalesce(F.sum("_c"), F.lit(0)).alias("_n"),
        F.coalesce(F.sum(F.col("_c") - 1), F.lit(0)).alias("_uv"),
    ] + [
        F.coalesce(F.sum(f"_v{i}"), F.lit(0)).alias(f"_v{i}")
        for i in range(len(rules))
    ]
    one = grouped.agg(*final)
    fk_name = None
    if fk is not None:
        parent, child_key, parent_key, fk_name = fk
        orphans = (
            df.select(F.col(child_key))
            .filter(F.col(child_key).isNotNull())
            .join(
                parent.select(F.col(parent_key).alias(child_key)).distinct(),
                child_key,
                "left_anti",
            )
        )
        one = one.crossJoin(
            orphans.agg(F.count(F.lit(1)).alias("_fkv"))
        )
    rows = [
        F.struct(*_report(F.lit(name), F.col("_n"), F.col(f"_v{i}")))
        for i, name in enumerate(rules.keys())
    ]
    rows.append(F.struct(*_report(F.lit(unique_name), F.col("_n"), F.col("_uv"))))
    if fk is not None:
        rows.append(F.struct(*_report(F.lit(fk_name), F.col("_n"), F.col("_fkv"))))
    packed = one.select(F.explode(F.array(*rows)).alias("r"))
    return packed.select(*[F.col(f"r.{c}") for c in _REPORT_COLS])


def quarantine_split(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Row-level enforcement of the same rule dictionary
    :func:`column_rule_checks` aggregates: returns ``(good, bad)`` where
    ``bad`` carries a ``violations`` array naming every failed rule (NULL
    rule result = violation, matching the aggregate). One map-side
    projection — no shuffle; both branches prune from the same scan."""
    tags = F.filter(
        F.array(
            *[
                F.when(ok, F.lit(None).cast("string")).otherwise(F.lit(name))
                for name, ok in rules.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("violations", tags)
    good = tagged.filter(F.size("violations") == 0).drop("violations")
    bad = tagged.filter(F.size("violations") > 0)
    return good, bad


def dim_bucket_rows(df: DataFrame, dims: dict[str, Column]) -> DataFrame:
    """One (dim, bucket) row per (corpus row, dimension), from a SINGLE
    explode(array(struct)) projection — the one definition of the profile
    shape that both the batch drift operator and the streaming profile store
    (`streaming/standing_stores.py: update_drift_store`) consume; their
    documented exact equality depends on this staying shared (review
    finding)."""
    pairs = F.array(
        *[
            F.struct(F.lit(name).alias("dim"), expr.cast("string").alias("bucket"))
            for name, expr in dims.items()
        ]
    )
    return df.select(F.explode(pairs).alias("p")).select(
        F.col("p.dim").alias("dim"), F.col("p.bucket").alias("bucket")
    )


def distribution_drift(
    old: DataFrame,
    new: DataFrame,
    dims: dict[str, Column],
    psi_micro_threshold: int = 200_000,
) -> DataFrame:
    """Distribution-drift report between two corpus snapshots — the
    data-monitoring gate run before a refreshed corpus is allowed into
    training (the PSI / population-stability-index shape used in ML
    monitoring). ``dims`` maps a dimension name to a bucket expression
    (e.g. language, power-of-two length bucket); per (dim, bucket) the
    report carries both snapshots' counts, Laplace-smoothed proportions,
    the PSI term, the dimension's total PSI, and a ``drifted`` verdict.

    Determinism contract: proportions are ratios of INTEGER counts (the
    identical doubles in any engine), per-bucket PSI terms are floored to
    integer MICRO-units, and the per-dimension total is an integer SUM of
    those micro-terms — summation order can never flip a bit, so the whole
    report hash-checks cross-engine (the one libm call, ``ln``, feeds a
    floor at 1e-6 granularity — the same accepted boundary as
    lm_bigram_score). Laplace add-one smoothing keeps vanished/new buckets
    finite without an epsilon clamp.

    Scale shape: each snapshot is scanned ONCE — every dimension's bucket
    row comes out of a single explode(array(struct...)) projection, so
    adding a dimension adds zero passes; the aggregate keys on
    (dim, bucket) with map-side combine (output rows = bucket count, a few
    dozen); window totals run over that tiny aggregate, never the corpus.
    """
    counted = (
        dim_bucket_rows(old, dims).withColumn("_t", F.lit(0))
        .unionByName(dim_bucket_rows(new, dims).withColumn("_t", F.lit(1)))
        .groupBy("dim", "bucket")
        .agg(
            F.sum(F.when(F.col("_t") == 0, 1).otherwise(0)).alias("old_cnt"),
            F.sum(F.when(F.col("_t") == 1, 1).otherwise(0)).alias("new_cnt"),
        )
    )
    return psi_report(counted, psi_micro_threshold)


def psi_report(counted: DataFrame, psi_micro_threshold: int = 200_000) -> DataFrame:
    """The PSI math over a pre-aggregated ``(dim, bucket, old_cnt, new_cnt)``
    profile table — shared by the batch `distribution_drift` and the
    streaming drift store (`streaming/standing_stores.py: drift_between`),
    which computes the same report from retained per-batch profiles without
    rescanning either corpus. Same determinism contract as the caller:
    integer-count ratios, micro-unit floors, integer dimension sums."""
    from pyspark.sql import Window

    from kda_flink_demo_spark.functions import det_round

    w = Window.partitionBy("dim")
    totals = (
        counted.withColumn("_old_total", F.sum("old_cnt").over(w))
        .withColumn("_new_total", F.sum("new_cnt").over(w))
        .withColumn("_nb", F.count(F.lit(1)).over(w))
    )
    old_frac = (F.col("old_cnt") + 1) / (F.col("_old_total") + F.col("_nb"))
    new_frac = (F.col("new_cnt") + 1) / (F.col("_new_total") + F.col("_nb"))
    psi_micro = F.floor(
        (new_frac - old_frac) * F.log(new_frac / old_frac) * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    per_bucket = totals.select(
        "dim",
        "bucket",
        F.col("old_cnt").cast("long").alias("old_cnt"),
        F.col("new_cnt").cast("long").alias("new_cnt"),
        det_round(old_frac, 6).alias("old_frac"),
        det_round(new_frac, 6).alias("new_frac"),
        psi_micro.alias("psi_micro"),
    )
    return per_bucket.withColumn(
        "dim_psi_micro", F.sum("psi_micro").over(Window.partitionBy("dim"))
    ).withColumn("drifted", F.col("dim_psi_micro") >= psi_micro_threshold)
