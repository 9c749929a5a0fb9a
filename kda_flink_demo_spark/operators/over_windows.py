"""Sliding event-time range OVER window (reference §2.5 W5) — batch form.

Reference semantics: one output row per input event carrying the count of events
for the same key within the trailing interval —
``COUNT(*) OVER (PARTITION BY N02_001 ORDER BY rowtime RANGE BETWEEN
INTERVAL '30' MINUTE PRECEDING AND CURRENT ROW)``
(/root/reference/.../StreamJobSqlSliding.java:153-160; hardcoded 30-minute variant
StreamJobSingle.java:149-156).

The batch form below is the correctness oracle for the streaming stateful version
(streaming/sliding_state.py). Scale notes: the window shuffles once on the key and
sorts within partitions; per-key data must fit a partition — with skewed keys,
pre-bucket by (key, coarse time bucket) and merge counts across the bucket
boundary, or use the streaming operator which holds only the trailing interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sliding_range_count(
    df: DataFrame,
    key: str = "railway_class",
    ts: str = "rowtime",
    preceding_seconds: int = 30 * 60,
    count_alias: str = "railway_class_count",
) -> DataFrame:
    """Append a trailing-interval count column to every event row.

    Implemented as a range frame over unix seconds: RANGE BETWEEN n PRECEDING AND
    CURRENT ROW on ``unix_ts`` is exactly the reference's interval-range frame.
    Sub-second event times are handled by framing on microseconds.
    """
    micros = (F.unix_micros(F.col(ts))).alias("_ts_us")
    spec = (
        Window.partitionBy(key)
        .orderBy(micros)
        .rangeBetween(-preceding_seconds * 1_000_000, 0)
    )
    return df.withColumn(count_alias, F.count(F.lit(1)).over(spec))


def resample_ffill(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 minute",
) -> DataFrame:
    """Time-series resampling with forward fill: a dense per-key minute grid
    over the observed time span, per-bucket aggregates left-joined on, gaps
    carried forward with ``last(..., ignorenulls)``.

    Scale shape: the grid is span-bound, not data-bound — (span/step) × keys
    rows regardless of input size (30 days × 1 min × k keys ≈ 43k×k). The
    expensive side is the per-bucket aggregate (one shuffle, partial map-side);
    the grid build is a broadcast cross join of one exploded sequence with the
    distinct keys, and the fill is one window per key. Per-bucket sums are
    det_round-ed BEFORE the fill so propagated values are cross-engine stable.
    """
    from kda_flink_demo_spark.functions import det_round

    bucket = F.date_trunc("minute", F.col(ts_col))
    agg = df.groupBy(F.col(key_col), bucket.alias("minute")).agg(
        det_round(F.sum(value_col), 4).alias("bucket_sum"),
        F.count(F.lit(1)).alias("bucket_count"),
    )
    bounds = df.agg(
        F.date_trunc("minute", F.min(ts_col)).alias("mn"),
        F.date_trunc("minute", F.max(ts_col)).alias("mx"),
    )
    minutes = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr(f"INTERVAL {step}"))).alias("minute")
    )
    keys = df.select(F.col(key_col)).distinct()
    grid = minutes.crossJoin(F.broadcast(keys))
    w = Window.partitionBy(key_col).orderBy("minute").rowsBetween(Window.unboundedPreceding, 0)
    return (
        grid.join(agg, [key_col, "minute"], "left")
        .select(
            key_col,
            "minute",
            F.last("bucket_sum", ignorenulls=True).over(w).alias("filled_sum"),
            F.coalesce("bucket_count", F.lit(0).cast("long")).alias("bucket_count"),
            F.col("bucket_sum").isNotNull().alias("had_data"),
        )
    )


def resample_interp(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 minute",
) -> DataFrame:
    """Time-series resampling with LINEAR interpolation: the same span-bound
    per-key grid as :func:`resample_ffill`, but gap buckets take
    ``prev + (next − prev) · Δt/ΔT`` between the surrounding observed
    buckets; grid cells before the first or after the last observation stay
    NULL (no extrapolation). Observed buckets keep their exact aggregate.

    Same scale shape as the ffill variant (one aggregate shuffle + two
    windows per key). The time fraction is computed on integer epoch
    seconds and the surrounding values are pre-rounded, so both engines run
    the identical double arithmetic; the interpolated value is
    ``det_round(4)``-ed on top."""
    from kda_flink_demo_spark.functions import det_round

    bucket = F.date_trunc("minute", F.col(ts_col))
    agg = df.groupBy(F.col(key_col), bucket.alias("minute")).agg(
        det_round(F.sum(value_col), 4).alias("bucket_sum"),
    )
    bounds = df.agg(
        F.date_trunc("minute", F.min(ts_col)).alias("mn"),
        F.date_trunc("minute", F.max(ts_col)).alias("mx"),
    )
    minutes = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr(f"INTERVAL {step}"))).alias("minute")
    )
    keys = df.select(F.col(key_col)).distinct()
    grid = minutes.crossJoin(F.broadcast(keys))
    base = grid.join(agg, [key_col, "minute"], "left").withColumn(
        "had_data", F.col("bucket_sum").isNotNull()
    )
    wp = Window.partitionBy(key_col).orderBy("minute").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # "next observed" as a REVERSE-ordered RUNNING window, not
    # first(ignorenulls) over CurrentRow..UnboundedFollowing: Spark's
    # WindowExec re-scans the remaining buffer per row for shrinking
    # ignore-nulls frames — O(n²) per partition, measured 354 s vs 1.5 s at
    # sf0.1 on the 43k-minute grid. last(ignorenulls) over DESC order is the
    # same value via the O(n) running-frame path.
    wn = Window.partitionBy(key_col).orderBy(F.col("minute").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    t = F.unix_timestamp("minute")
    obs_minute = F.when(F.col("had_data"), F.col("minute"))
    prev_v = F.last("bucket_sum", ignorenulls=True).over(wp)
    prev_t = F.unix_timestamp(F.last(obs_minute, ignorenulls=True).over(wp))
    next_v = F.last("bucket_sum", ignorenulls=True).over(wn)
    next_t = F.unix_timestamp(F.last(obs_minute, ignorenulls=True).over(wn))
    interp = det_round(
        prev_v + (next_v - prev_v) * ((t - prev_t) / (next_t - prev_t)), 4
    )
    return base.select(
        key_col,
        "minute",
        F.when(F.col("had_data"), F.col("bucket_sum"))
        .when(prev_v.isNotNull() & next_v.isNotNull(), interp)
        .otherwise(F.lit(None).cast("double"))
        .alias("interp_sum"),
        "had_data",
    )


def anomaly_zscore(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    lookback_rows: int = 50,
    min_history: int = 20,
    threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window z-score anomaly detection: flag events whose value
    deviates more than ``threshold`` standard deviations from the mean of the
    previous ``lookback_rows`` events of the same key (the event itself is
    EXCLUDED from its own baseline — frame ends at 1 PRECEDING). Events with
    fewer than ``min_history`` prior observations are never flagged
    (cold-start guard).

    Scale shape: one shuffle on the key, one in-partition sort, ONE
    WindowExec evaluated on the O(n) incremental path. A naive
    ``ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING`` frame makes Spark
    recompute every aggregate over the full frame per output row (no
    retraction support — O(rows · frame · aggs), measured 2.1 s vs 0.6 s at
    sf0.1); instead the trailing count / Σv / Σv² are each the DIFFERENCE of
    two running ``UNBOUNDED PRECEDING``-to-fixed-offset sums, which Spark
    (and DuckDB) advance incrementally. Mean/variance come from the sums
    (var = (Σv² − (Σv)²/n)/(n−1)); the oracle mirrors the identical
    arithmetic so both engines run the same doubles. Ties on ``ts`` are
    broken by ``id_col`` so frame contents are deterministic. The z-score is
    det_round(6)-ed and the threshold tests the rounded value — a
    cross-engine flip would need a true z within float-fold noise (~1e-9) of
    the threshold. Caveat (documented, fixture-continuous data can't hit
    it): near-constant history makes the variance difference catastrophic-
    cancellation-sized; the ``var > 0`` guard drops exact-constant frames,
    and genuinely near-constant sensors should use a coarser det_round on
    the variance.
    """
    from kda_flink_demo_spark.functions import det_round

    base = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col))
    upto_prev = base.rowsBetween(Window.unboundedPreceding, -1)
    before_frame = base.rowsBetween(Window.unboundedPreceding, -(lookback_rows + 1))
    v = F.col(value_col)
    # NaN is MISSING data here, same as NULL: it neither enters the baseline
    # sums (a raw sum would poison every later frame to NaN) nor gets flagged
    # itself (Spark orders NaN above all doubles, so abs(NaN) > threshold
    # would otherwise flag it). The streaming twin applies the identical rule.
    vv = F.nanvl(v, F.lit(None).cast("double"))
    v2 = vv * vv
    n = F.count(vv).over(upto_prev) - F.coalesce(
        F.count(vv).over(before_frame), F.lit(0)
    )
    s1 = F.coalesce(F.sum(vv).over(upto_prev), F.lit(0.0)) - F.coalesce(
        F.sum(vv).over(before_frame), F.lit(0.0)
    )
    s2 = F.coalesce(F.sum(v2).over(upto_prev), F.lit(0.0)) - F.coalesce(
        F.sum(v2).over(before_frame), F.lit(0.0)
    )
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - 1)
    z = det_round((vv - mean) / F.sqrt(var), 6)
    return (
        df.select(
            id_col,
            key_col,
            ts_col,
            v,
            F.when((n >= min_history) & (var > 0), z).alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > threshold)
        .select(id_col, key_col, ts_col, value_col, "zscore")
    )


def anomaly_zscore_oracle_sql(
    table: str = "events",
    lookback_rows: int = 50,
    min_history: int = 20,
    threshold: float = 3.0,
) -> str:
    from kda_flink_demo_spark.functions import det_round_sql

    # mirrors the engine's exact arithmetic: trailing stats as differences of
    # two running unbounded-preceding sums, then var = (Σv² − (Σv)²/n)/(n−1)
    z = det_round_sql("(v - _s1 / _n) / sqrt((_s2 - _s1 * _s1 / _n) / (_n - 1))", 6)
    return f"""
    WITH src AS (
        SELECT event_id, event_type, ts, value,
               CASE WHEN isnan(value) THEN NULL ELSE value END AS v
        FROM {table}
    ),
    scored AS (
        SELECT event_id, event_type, ts, value, v,
               count(v) OVER wp - coalesce(count(v) OVER wb, 0) AS _n,
               coalesce(sum(v) OVER wp, 0.0)
                   - coalesce(sum(v) OVER wb, 0.0) AS _s1,
               coalesce(sum(v * v) OVER wp, 0.0)
                   - coalesce(sum(v * v) OVER wb, 0.0) AS _s2
        FROM src
        WINDOW wp AS (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               wb AS (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND {lookback_rows + 1} PRECEDING)
    )
    SELECT event_id, event_type, ts, value, {z} AS zscore
    FROM scored
    WHERE _n >= {min_history} AND (_s2 - _s1 * _s1 / _n) / (_n - 1) > 0
      AND abs({z}) > {threshold}
    """
