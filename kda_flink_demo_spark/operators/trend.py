"""Per-key linear trend fitting + one-step forecast over time-bucketed
counts — the capacity-planning / anomaly-baseline readout ("is this event
type growing, and what do we expect next minute?").

Exactness design: the OLS closed form is computed from INTEGER sufficient
statistics. Counts are integers; the time axis is re-based per key to
"minutes since the key's first bucket" (small ints — also keeps Σx² far from
int64 even at century-long histories), so n, Σx, Σy, Σxy, Σx² are all exact
int64 in BOTH engines regardless of aggregation order — no float fold, no
det_round needed. The only floating point is the final closed-form division,
the same two IEEE ops in both engines:

    slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²ₛᵤₘ)
    intercept = (Σy − slope·Σx) / n
    forecast  = intercept + slope·(x_max + 1)

Degenerate keys (a single bucket, or all observations in one bucket) have a
zero denominator: slope/forecast are NULL by explicit guard (the integer
comparison is exact), never a division error or an engine-specific ±inf.

Scale shape: one (key, bucket) partial→final count aggregate, then one
per-key aggregate over bucket rows (≪ events). Both shuffles carry
fixed-width keys; nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trend_forecast(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "minute",
) -> DataFrame:
    """(key, n_points, slope, intercept, forecast_next): least-squares count
    trend per key over ``bucket`` time buckets, plus the next bucket's
    forecast. See module docstring for the integer-exactness contract."""
    counts = df.groupBy(
        F.col(key_col), F.date_trunc(bucket, F.col(ts_col)).alias("_b")
    ).agg(F.count(F.lit(1)).alias("_y"))
    # re-base the time axis per key: minutes since the key's first bucket
    from pyspark.sql import Window

    x = (
        (F.unix_timestamp("_b") - F.unix_timestamp(F.min("_b").over(Window.partitionBy(key_col))))
        / 60
    ).cast("long")
    obs = counts.select(F.col(key_col), x.alias("_x"), F.col("_y"))
    stats = obs.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.max("_x").alias("_xmax"),
    )
    denom = stats["n_points"] * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        denom != 0,
        (stats["n_points"] * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("double")
        / denom.cast("double"),
    )
    intercept = (F.col("_sy").cast("double") - slope * F.col("_sx").cast("double")) / (
        stats["n_points"].cast("double")
    )
    forecast = intercept + slope * (F.col("_xmax") + 1).cast("double")
    return stats.select(
        key_col,
        "n_points",
        slope.alias("slope"),
        intercept.alias("intercept"),
        forecast.alias("forecast_next"),
    )


def trend_forecast_oracle_sql(
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "minute",
    table: str = "events",
) -> str:
    """DuckDB twin — identical integer sufficient statistics and the same
    closed-form division order."""
    return f"""
    WITH counts AS (
        SELECT {key_col}, date_trunc('{bucket}', {ts_col}) AS b,
               CAST(count(*) AS BIGINT) AS y
        FROM {table} GROUP BY 1, 2
    ),
    obs AS (
        SELECT {key_col},
               CAST((epoch(b) - epoch(min(b) OVER (PARTITION BY {key_col}))) / 60
                    AS BIGINT) AS x,
               y
        FROM counts
    ),
    stats AS (
        SELECT {key_col},
               CAST(count(*) AS BIGINT) AS n_points,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx,
               max(x) AS xmax
        FROM obs GROUP BY 1
    )
    SELECT {key_col}, n_points,
           CASE WHEN n_points * sxx - sx * sx <> 0 THEN
               CAST(n_points * sxy - sx * sy AS DOUBLE)
                   / CAST(n_points * sxx - sx * sx AS DOUBLE)
           END AS slope,
           (CAST(sy AS DOUBLE) - (CASE WHEN n_points * sxx - sx * sx <> 0 THEN
               CAST(n_points * sxy - sx * sy AS DOUBLE)
                   / CAST(n_points * sxx - sx * sx AS DOUBLE)
           END) * CAST(sx AS DOUBLE)) / CAST(n_points AS DOUBLE) AS intercept,
           (CAST(sy AS DOUBLE) - (CASE WHEN n_points * sxx - sx * sx <> 0 THEN
               CAST(n_points * sxy - sx * sy AS DOUBLE)
                   / CAST(n_points * sxx - sx * sx AS DOUBLE)
           END) * CAST(sx AS DOUBLE)) / CAST(n_points AS DOUBLE)
               + (CASE WHEN n_points * sxx - sx * sx <> 0 THEN
                   CAST(n_points * sxy - sx * sy AS DOUBLE)
                       / CAST(n_points * sxx - sx * sx AS DOUBLE)
               END) * CAST(xmax + 1 AS DOUBLE) AS forecast_next
    FROM stats
    """
