"""Breadth query registrations: sessionization, analytic window pack, scalar
function packs, embedding centroids, TPC-H-style join/filter shapes, CUBE.
Imported by ``registry`` (decorators run at import)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from kda_flink_demo_spark.functions import det_round
from kda_flink_demo_spark.io.sources import load_table
from kda_flink_demo_spark.operators.aggregates import multi_resolution_rollup_oracle_sql
from kda_flink_demo_spark.operators.over_windows import anomaly_zscore_oracle_sql
from kda_flink_demo_spark.operators.windows import session_counts
from kda_flink_demo_spark.registry import register


@register(
    "session_windows_5m",
    """
    WITH flagged AS (
        SELECT event_type, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts)
    ),
    sess AS (
        SELECT event_type, ts,
               sum(new_sess) OVER (PARTITION BY event_type ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT event_type AS railway_class,
           count(*) AS railway_class_count,
           min(ts) AS window_start,
           max(ts) + INTERVAL '5 minutes' AS window_end
    FROM sess GROUP BY event_type, sid
    """,
)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 breadth (absent in the reference, SURVEY §2.5): gap-based session
    windows via Spark's session_window. Oracle sessionizes with lag/cumsum; the
    >= gap split matches Spark's end-exclusive [start, last+gap) window."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
    )
    return session_counts(ev, gap="5 minutes")


@register(
    "analytic_pack",
    """
    SELECT event_id, event_type, ts, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           floor(avg(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) * 1000000.0 + 0.5)
               / 1000000.0 AS moving_avg_4,
           sum(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) IS NOT NULL AS has_running
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    """,
)
def q_analytic_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function breadth: lag/lead/moving average/running sum over a
    deterministic (ts, event_id) order. One shuffle on the partition key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w4 = w.rowsBetween(-3, 0)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        det_round(F.avg("value").over(w4), 6).alias("moving_avg_4"),
        F.sum("value").over(wrun).isNotNull().alias("has_running"),
    )


@register(
    "string_function_pack",
    """
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substring(p_name, 2, 5) AS name_sub,
           length(p_name) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_type, ' ', '_') AS type_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           trim(p_name) AS name_trim,
           contains(p_type, 'BRASS') AS is_brass,
           split_part(p_type, ' ', 1) AS type_first_word
    FROM part
    """,
)
def q_string_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function surface (UDF-free, all JVM built-ins). length() is
    cast to match DuckDB's BIGINT."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 2, 5).alias("name_sub"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.contains(F.col("p_type"), F.lit("BRASS")).alias("is_brass"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
    )


@register(
    "date_function_pack",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           day(o_orderdate) AS order_day,
           CAST(o_orderdate AS DATE) + INTERVAL '30 days' AS due_ts,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS days_to_cutoff,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
           greatest(year(o_orderdate), 1995) AS year_floor,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_iso
    FROM orders
    """,
)
def q_date_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar date/time surface. DuckDB year()/month()/day() return BIGINT —
    Spark's int results are cast up; date arithmetic goes through explicit casts
    so both engines produce timestamps."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        (F.col("o_orderdate").cast("date") + F.expr("INTERVAL 30 DAYS"))
        .cast("timestamp")
        .alias("due_ts"),
        F.datediff(F.lit("1998-12-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_cutoff"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.greatest(F.year("o_orderdate"), F.lit(1995)).cast("long").alias("year_floor"),
        # the reference's commented-out TimestampToString scalar UDF
        # (StreamJobSingle.java:144-145) is a builtin here
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_iso"),
    )


@register(
    "math_function_pack",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS disc_dev,
           l_quantity % 7 AS qty_mod,
           sqrt(l_extendedprice) AS price_sqrt,
           power(l_discount, 2) AS disc_sq,
           ceil(l_extendedprice / 1000) AS price_k_ceil,
           floor(l_extendedprice / 1000) AS price_k_floor,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           least(l_tax, l_discount) AS min_rate,
           greatest(l_tax, l_discount) AS max_rate
    FROM lineitem
    """,
)
def q_math_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar math surface. Only IEEE-exact operations (sqrt, power-of-2, abs,
    mod, ceil/floor) — transcendentals (ln/exp) are excluded from the oracle set
    because JVM and C++ libm may differ in the last ulp."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        (F.col("l_quantity") % 7).alias("qty_mod"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.pow("l_discount", 2).alias("disc_sq"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("double").alias("price_k_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).cast("double").alias("price_k_floor"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
    )


@register(
    "embedding_centroids",
    """
    SELECT label, pos,
           floor(avg(v) * 1000000.0 + 0.5) / 1000000.0 AS centroid_val
    FROM (
        SELECT label,
               unnest(range(1, len(embedding) + 1)) AS pos,
               unnest(embedding::DOUBLE[]) AS v
        FROM embeddings
    ) GROUP BY 1, 2
    """,
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding vectors in long form (label, pos,
    mean): posexplode + grouped avg — the scale-correct formulation (no
    collect, one shuffle on (label, pos), partial aggregation map-side)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .select("label", (F.col("pos0") + 1).cast("long").alias("pos"), F.col("v").cast("double").alias("v"))
        .groupBy("label", "pos")
        .agg(det_round(F.avg("v"), 6).alias("centroid_val"))
    )


@register(
    "tpch_q6_revenue",
    """
    SELECT floor(sum(l_extendedprice * l_discount) * 100.0 + 0.5) / 100.0 AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight scan-side predicates (all pushed to parquet) + a
    single global aggregate — the pushdown showcase query."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            det_round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q3_shipping",
    """
    SELECT o_orderkey,
           floor(sum(l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter broadcast into a fact-fact join +
    grouped revenue + deterministic top-10."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(det_round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "tumbling_value_stats",
    """
    SELECT event_type AS railway_class,
           time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           count(*) AS n_events,
           floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS sum_value,
           floor(avg(value) * 1000000.0 + 0.5) / 1000000.0 AS avg_value,
           floor(min(value) * 10000.0 + 0.5) / 10000.0 AS min_value,
           floor(max(value) * 10000.0 + 0.5) / 10000.0 AS max_value
    FROM events GROUP BY 1, 2
    """,
)
def q_tumbling_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed general aggregates (sum/avg/min/max) — the reference only ever
    COUNTs (A1–A3); any Catalyst aggregate drops into the same windowed plan."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        ev.groupBy(win.alias("w"), F.col("event_type").alias("railway_class"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            det_round(F.sum("value"), 4).alias("sum_value"),
            det_round(F.avg("value"), 6).alias("avg_value"),
            det_round(F.min("value"), 4).alias("min_value"),
            det_round(F.max("value"), 4).alias("max_value"),
        )
        .select(
            "railway_class",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
            "avg_value",
            "min_value",
            "max_value",
        )
    )


@register(
    "skew_salted_agg",
    """
    SELECT user_id % 10 AS user_bucket, count(*) AS cnt
    FROM events GROUP BY 1
    """,
)
def q_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation pattern: two-stage salted aggregation. Stage 1 groups on
    (key, salt) — spreading one hot key over ``salt_buckets`` reducers — stage 2
    merges the partials on the bare key. Result is identical to a direct group-by
    (the oracle); at 100 TB with a hot key this is the difference between one
    straggler reducer and even utilization. (AQE skew-join handles the join case
    automatically; salting covers aggregations.)"""
    ev = load_table(spark, sf_dir, "events")
    salt_buckets = 16
    salted = ev.select(
        (F.col("user_id") % 10).alias("user_bucket"),
        (F.xxhash64("event_id") % salt_buckets).alias("_salt"),
    )
    partial = salted.groupBy("user_bucket", "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy("user_bucket").agg(F.sum("_c").alias("cnt"))


@register(
    "udaf_weighted_avg",
    """
    SELECT event_type,
           floor(sum(value * (user_id % 7 + 1)) / sum(user_id % 7 + 1) * 1000000.0 + 0.5)
               / 1000000.0 AS weighted_avg
    FROM events GROUP BY 1
    """,
)
def q_udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate surface (reference A4: a hand-written merge-able Flink
    AggregateFunction, StreamJobTumblingOffset.java:176-200): here a pandas
    GROUPED_AGG UDF computing a weighted average — Arrow-batched, partial-agg
    capable, registered like any aggregate. (Built-ins are still preferred in
    hot paths; this exercises the escape hatch.)"""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_avg(v: pd.Series, w: pd.Series) -> float:
        import math

        return math.floor(float((v * w).sum() / w.sum()) * 1e6 + 0.5) / 1e6

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", (F.col("user_id") % 7 + 1).cast("double").alias("w")
    )
    return ev.groupBy("event_type").agg(weighted_avg("value", "w").alias("weighted_avg"))


@register(
    "percentiles_by_type",
    """
    SELECT event_type,
           floor(quantile_cont(value, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS median_value,
           floor(quantile_cont(value, 0.9) * 1000000.0 + 0.5) / 1000000.0 AS p90_value,
           floor(quantile_disc(value, 0.5) * 10000.0 + 0.5) / 10000.0 AS median_disc
    FROM events GROUP BY 1
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (interpolated + discrete). Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the linear-interpolation
    definition; at 100 TB swap in ``approx_percentile`` (t-digest sketch, no
    full sort) — same call shape."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        det_round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
        det_round(F.expr("percentile(value, 0.9)"), 6).alias("p90_value"),
        det_round(F.expr("percentile_approx(value, 0.5, 2147483647)"), 4).alias("median_disc"),
    )


@register(
    "pivot_event_counts",
    """
    SELECT user_id % 5 AS user_bucket,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'view')     AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events GROUP BY 1
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation). Spark's ``pivot`` with an explicit
    value list compiles to the same single-shuffle conditional-agg plan as the
    oracle's FILTER clauses — listing values avoids the extra distinct-values
    job at scale."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select((F.col("user_id") % 5).alias("user_bucket"), "event_type")
        .groupBy("user_bucket")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@register(
    "array_function_pack",
    """
    SELECT vec_id,
           len(embedding) AS arr_len,
           array_to_string(list_transform(embedding[1:5],
               x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS VARCHAR)), ',') AS head5,
           list_max(embedding) AS arr_max,
           list_min(embedding) AS arr_min,
           embedding[1] AS first_val,
           array_to_string(list_transform(list_sort(list_transform(embedding[1:8],
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))),
               x -> CAST(x AS VARCHAR)), ',') AS head8_sorted,
           list_contains(embedding, 0.0) AS has_zero
    FROM embeddings
    """,
)
def q_array_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over the embedding column (slice/sort/min/max/
    element_at/contains). Array-valued outputs are quantized per element to a
    BIGINT (floor(x*1e6+0.5) — exact on float32-widened doubles in both
    engines) and joined into a CSV string: the grading driver's canonicalizer
    sorts rows via pandas and cannot hash raw array cells (numpy.ndarray is
    unhashable), so the *output* must be scalar while the array functions stay
    exercised. Sorting happens on the quantized ints on BOTH sides so tie
    order cannot diverge."""
    emb = load_table(spark, sf_dir, "embeddings")

    def _q(x):  # per-element deterministic quantization to BIGINT
        return F.floor(x.cast("double") * 1000000.0 + F.lit(0.5)).cast("long")

    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("arr_len"),
        F.concat_ws(
            ",", F.transform(F.slice("embedding", 1, 5), lambda x: _q(x).cast("string"))
        ).alias("head5"),
        F.array_max("embedding").alias("arr_max"),
        F.array_min("embedding").alias("arr_min"),
        F.element_at("embedding", 1).alias("first_val"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.transform(F.slice("embedding", 1, 8), _q)),
                lambda x: x.cast("string"),
            ),
        ).alias("head8_sorted"),
        F.array_contains("embedding", F.lit(0.0).cast("float")).alias("has_zero"),
    )


@register(
    "map_function_pack",
    """
    SELECT event_id,
           'k' AS map_key,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS map_value,
           len(json_keys(props)) AS n_keys
    FROM events
    """,
)
def q_map_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: from_json into map<string,long>, explode to (key, value)
    rows, map cardinality. (The fixture's props is single-key JSON, so explode
    emits one row per event — the oracle flattens the same way.)"""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id", F.explode(m).alias("map_key", "map_value"), F.size(m).cast("long").alias("n_keys")
    )


@register(
    "tpch_q14_promo_share",
    """
    SELECT floor(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) / 10000.0
               AS promo_revenue_pct,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_shipdate < TIMESTAMP '1995-09-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-revenue share over a broadcast part join
    with pushed-down date predicates."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-09-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
    return (
        li.join(broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            det_round(100.0 * promo / F.sum(rev), 4).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q18_large_orders",
    """
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           floor(sum(l_quantity) * 100.0 + 0.5) / 100.0 AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2, 3, 4
    HAVING sum(l_quantity) > 250
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: grouped HAVING over a fact-fact join + deterministic
    top-20 (TakeOrderedAndProject)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(
            F.sum("l_quantity").alias("_q"),
        )
        .filter(F.col("_q") > 250)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_totalprice", det_round(F.col("_q"), 2).alias("total_qty")
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "listagg_nations_by_region",
    """
    SELECT r_name AS region_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           count(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1
    """,
)
def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation: collect_list is order-nondeterministic in a
    distributed shuffle, so deterministic listagg = sort_array(collect_list)
    before joining — matching DuckDB's string_agg(... ORDER BY)."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register(
    "unpivot_part_metrics",
    """
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS metric_value FROM part
    UNION ALL
    SELECT p_partkey, 'retail_price', p_retailprice FROM part
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide columns → (metric, value) long form via Spark's native
    ``unpivot`` (same single-pass Generate plan as the oracle's UNION ALL but
    one scan instead of two)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").alias("retail_price"),
        )
        .unpivot("p_partkey", ["size", "retail_price"], "metric", "metric_value")
    )


@register(
    "count_windows_100",
    """
    WITH numbered AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT event_type AS railway_class,
           (rn - 1) // 100 AS window_id,
           count(*) AS railway_class_count,
           floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS sum_value
    FROM numbered GROUP BY 1, 2
    """,
)
def q_count_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based (row) windows — Flink's countWindow family, which Spark lacks
    natively: every 100 events per key form a window, built from row_number
    over a deterministic order. One shuffle + per-partition sort, then a
    grouped aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .select(
            F.col("event_type").alias("railway_class"),
            F.floor((F.col("rn") - 1) / 100).cast("long").alias("window_id"),
            "value",
        )
        .groupBy("railway_class", "window_id")
        .agg(
            F.count(F.lit(1)).alias("railway_class_count"),
            det_round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@register(
    "funnel_conversion",
    """
    WITH su AS (
        SELECT user_id, min(ts) AS t_signup FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    pu AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT su.user_id, su.t_signup,
           min(CASE WHEN pu.ts > su.t_signup THEN pu.ts END) AS t_first_purchase,
           min(CASE WHEN pu.ts > su.t_signup THEN pu.ts END) IS NOT NULL AS converted
    FROM su LEFT JOIN pu ON su.user_id = pu.user_id
    GROUP BY 1, 2
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-funnel analysis (signup → first later purchase): conditional
    aggregation over a keyed left join — one shuffle on user_id each side."""
    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    pu = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    first_purchase = F.min(F.when(F.col("ts") > F.col("t_signup"), F.col("ts")))
    return (
        su.join(pu, "user_id", "left")
        .groupBy("user_id", "t_signup")
        .agg(
            first_purchase.alias("t_first_purchase"),
            first_purchase.isNotNull().alias("converted"),
        )
    )


@register(
    "retention_cohorts",
    """
    WITH firsts AS (
        SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        FROM events GROUP BY 1
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
        FROM events
    )
    SELECT f.cohort_week,
           date_diff('day', CAST(f.cohort_week AS DATE), CAST(a.active_week AS DATE)) // 7
               AS week_offset,
           count(DISTINCT f.user_id) AS active_users
    FROM firsts f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted in each
    later active week. Two grouped aggregations + one user-keyed join."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.col("active_week").cast("date"), F.col("cohort_week").cast("date")) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "hash_function_pack",
    """
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           to_base64(encode(substring(text, 1, 12))) AS head_b64,
           hex(encode(substring(text, 1, 4))) AS head_hex,
           xor(doc_id, 255) AS id_xor,
           doc_id & 15 AS id_and,
           doc_id | 16 AS id_or,
           doc_id << 2 AS id_shl
    FROM documents
    """,
)
def q_hash_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/binary scalar surface: md5/sha256 (hex-identical across engines),
    base64, hex, bitwise ops."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.base64(F.encode(F.substring("text", 1, 12), "UTF-8")).alias("head_b64"),
        F.upper(F.hex(F.encode(F.substring("text", 1, 4), "UTF-8"))).alias("head_hex"),
        F.col("doc_id").bitwiseXOR(F.lit(255)).alias("id_xor"),
        F.col("doc_id").bitwiseAND(F.lit(15)).alias("id_and"),
        F.col("doc_id").bitwiseOR(F.lit(16)).alias("id_or"),
        F.shiftleft("doc_id", 2).alias("id_shl"),
    )


@register(
    "null_semantics_pack",
    """
    SELECT event_id,
           nullif(event_type, 'click') AS maybe_type,
           coalesce(nullif(event_type, 'click'), 'was_click') AS filled,
           nullif(event_type, 'click') IS NOT DISTINCT FROM NULL AS is_null_safe,
           CASE WHEN value > 90 THEN 'high' WHEN value > 50 THEN 'mid' ELSE 'low' END AS value_band,
           ifnull(nullif(user_id % 3, 0), -1) AS mod_or_default
    FROM events
    """,
)
def q_null_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic surface: nullif/coalesce/ifnull, null-safe equality
    (Spark <=> ≡ DuckDB IS NOT DISTINCT FROM), CASE WHEN. The fixtures contain
    no NULLs, so nullif manufactures them."""
    ev = load_table(spark, sf_dir, "events")
    maybe = F.expr("nullif(event_type, 'click')")
    return ev.select(
        "event_id",
        maybe.alias("maybe_type"),
        F.coalesce(maybe, F.lit("was_click")).alias("filled"),
        maybe.eqNullSafe(F.lit(None).cast("string")).alias("is_null_safe"),
        F.when(F.col("value") > 90, "high")
        .when(F.col("value") > 50, "mid")
        .otherwise("low")
        .alias("value_band"),
        F.expr("ifnull(nullif(user_id % 3, 0), -1)").alias("mod_or_default"),
    )


@register(
    "cube_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
           floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 breadth: CUBE grouping sets with count + rounded sum."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"), det_round(F.sum("o_totalprice"), 2).alias("total")
    )


@register(
    "asof_join_last_purchase",
    """
    WITH purchases AS (
        SELECT user_id, ts AS purchase_ts, max(event_id) AS purchase_id
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    ),
    clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, c.ts, p.purchase_ts, p.purchase_id
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.purchase_ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: every click gets the same user's most recent
    purchase at or before the click instant (NULLs before the first purchase).
    Spark lacks a native ASOF JOIN — ``operators.asof.asof_join_backward``
    implements it as union + running last(ignorenulls) window (one shuffle,
    linear scan; see that module for the scale argument). Oracle: DuckDB's
    native ASOF LEFT JOIN — an independent implementation of the semantics.
    Right-side (user, ts) ties are pre-deduplicated (max event_id) so both
    engines are deterministic."""
    from kda_flink_demo_spark.operators.asof import asof_join_backward

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("purchase_ts"))
        .agg(F.max("event_id").alias("purchase_id"))
    )
    return asof_join_backward(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="purchase_ts",
        payload_cols=["purchase_ts", "purchase_id"],
    )


@register(
    "range_join_recent_purchases",
    """
    WITH purchases AS (
        SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, count(p.pts) AS recent_purchases
    FROM clicks c LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.pts <= c.ts AND p.pts > c.ts - INTERVAL 1 HOUR
    GROUP BY 1, 2
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time range join: per click, how many purchases the same user made
    in the trailing hour. The range predicate rides an EQUI-join on user_id, so
    Catalyst plans a hash/sort-merge join on the key with the time bounds as
    join filters — per-key work, not an O(n·m) inequality join."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("pts")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("pts") <= F.col("ts"))
        & (F.col("pts") > F.col("ts") - F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("pts").alias("recent_purchases")
    )


@register(
    "interval_join_views_purchases",
    """
    SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
           p.event_id AS purchase_id, p.ts AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1800 SECONDS
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join
    (streaming/jobs.py:job_interval_join — Flink's KeyedStream.intervalJoin
    shape): each view joins the same user's purchases within [view_ts,
    view_ts + 30 min]. The SAME builder serves both modes (withWatermark is a
    no-op on batch), so this oracle row externally checks the exact join the
    streaming test replays; the range predicate rides the user_id equi-join,
    and in streaming the watermark-bounded state holds only rows inside the
    join bound."""
    from kda_flink_demo_spark.streaming.jobs import job_interval_join

    ev = load_table(spark, sf_dir, "events")
    return job_interval_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        bound_seconds=1800,
    )


@register(
    "deterministic_sample",
    """
    SELECT doc_id, source
    FROM documents
    WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
          < CASE source WHEN 'src0' THEN 50 WHEN 'src1' THEN 25 ELSE 10 END
    """,
)
def q_det_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted DETERMINISTIC sampling — the corpus-mixing primitive of
    training-data pipelines (mix sources at fixed rates, reproducibly).
    ``rand()`` would differ per run/engine/partitioning; hashing the row key
    (md5 → first 8 hex digits → mod 100) gives an identical sample on every
    engine, cluster size, and rerun, and the per-source rate is just a CASE on
    the threshold. Scan-speed narrow filter, no shuffle, no RNG state."""
    docs = load_table(spark, sf_dir, "documents")
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        % 100
    )
    rate = (
        F.when(F.col("source") == "src0", 50)
        .when(F.col("source") == "src1", 25)
        .otherwise(10)
    )
    return docs.filter(h < rate).select("doc_id", "source")


@register(
    "grouping_sets_orders",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
           floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (asymmetric — not expressible as rollup/cube):
    Spark plans one Expand + single hash aggregate, same as the rollup path."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
               floor(sum(o_totalprice) * 100.0D + 0.5D) / 100.0D AS total
        FROM orders_gs_v
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "json_malformed_tolerance",
    """
    SELECT event_id,
           CASE WHEN json_valid(c) THEN CAST(json_extract_string(c, '$.k') AS BIGINT) END AS k_value,
           event_id % 7 = 0 AS is_corrupt
    FROM (
        SELECT event_id,
               CASE WHEN event_id % 7 = 0 THEN substring(props, 1, 5) ELSE props END AS c
        FROM events
    )
    """,
)
def q_json_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-JSON tolerance (the reference's schema-less ObjectNode source
    never fails on bad records; StreamJobSqlTumbling.java:64-77 only guards the
    timestamp): corrupt every 7th props payload and extract through it —
    ``get_json_object`` yields NULL on unparseable input, the pipeline keeps
    flowing. Oracle guards with json_valid (DuckDB's extractor raises)."""
    ev = load_table(spark, sf_dir, "events")
    c = F.when(F.col("event_id") % 7 == 0, F.substring("props", 1, 5)).otherwise(F.col("props"))
    return ev.select(
        "event_id",
        F.get_json_object(c, "$.k").cast("long").alias("k_value"),
        (F.col("event_id") % 7 == 0).alias("is_corrupt"),
    )


@register(
    "resample_1m_ffill",
    """
    WITH agg AS (
        SELECT event_type, date_trunc('minute', ts) AS minute,
               floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS bucket_sum,
               count(*) AS bucket_count
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT date_trunc('minute', min(ts)) AS mn, date_trunc('minute', max(ts)) AS mx
               FROM events),
    minutes AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 MINUTE)) AS minute FROM bounds),
    grid AS (SELECT k.event_type, m.minute
             FROM minutes m CROSS JOIN (SELECT DISTINCT event_type FROM events) k)
    SELECT g.event_type, g.minute,
           last_value(a.bucket_sum IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.minute
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum,
           coalesce(a.bucket_count, 0) AS bucket_count,
           a.bucket_sum IS NOT NULL AS had_data
    FROM grid g LEFT JOIN agg a ON g.event_type = a.event_type AND g.minute = a.minute
    """,
)
def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 1-minute resample per event_type with forward-filled gap values —
    the time-series regularization primitive (span-bound grid, one shuffle)."""
    from kda_flink_demo_spark.operators.over_windows import resample_ffill

    return resample_ffill(load_table(spark, sf_dir, "events"))


@register(
    "window_frame_pack",
    """
    SELECT event_id,
           first_value(value) OVER w AS first_in_type,
           last_value(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_in_type,
           nth_value(value, 3) OVER (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_in_type,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    """,
)
def q_window_frame_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame breadth: first/last/nth_value with explicit full frames,
    ntile, percent_rank, cume_dist — one shuffle on the partition key, total
    (ts, event_id) order so every function is deterministic. Ratio functions
    divide identical integers on both engines, so no rounding is needed."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        F.first("value").over(w).alias("first_in_type"),
        F.last("value").over(wfull).alias("last_in_type"),
        F.nth_value("value", 3).over(wfull).alias("third_in_type"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "stats_aggregate_pack",
    """
    SELECT event_type,
           floor(stddev_samp(value) * 1000000.0 + 0.5) / 1000000.0 AS sd_value,
           floor(var_samp(value) * 10000.0 + 0.5) / 10000.0 AS var_value,
           floor(corr(value, CAST(user_id AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS corr_vu,
           floor(covar_samp(value, CAST(user_id AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS covar_vu,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_stats_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: sample stddev/variance, correlation,
    covariance (all single-pass partial-aggregable — engines use different
    update formulas, so every output is det_round-ed; skewness/kurtosis are
    deliberately excluded: Spark and DuckDB disagree on the sample-vs-
    population definition)."""
    ev = load_table(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        det_round(F.stddev_samp("value"), 6).alias("sd_value"),
        det_round(F.var_samp("value"), 4).alias("var_value"),
        det_round(F.corr(F.col("value"), u), 6).alias("corr_vu"),
        det_round(F.covar_samp(F.col("value"), u), 4).alias("covar_vu"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "value_histogram",
    """
    SELECT bucket, n, sum_v, min_v, max_v,
           floor((bucket * 25.0) * 1000000.0 + 0.5) / 1000000.0 AS bucket_lo
    FROM (
        SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
               count(*) AS n,
               floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS sum_v,
               min(value) AS min_v,
               max(value) AS max_v
        FROM events GROUP BY 1
    )
    """,
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram over events.value (width 25): one partial-
    aggregated groupBy whose shuffle cardinality is the bucket count."""
    from kda_flink_demo_spark.operators.aggregates import value_histogram

    return value_histogram(load_table(spark, sf_dir, "events"), "value", width=25.0)


_CDC_BASE_COLS = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"


@register(
    "merge_changes_cdc",
    f"""
    WITH base AS (
        SELECT {_CDC_BASE_COLS}, 'I' AS op, 0 AS seq FROM orders
    ),
    upd AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               floor(o_totalprice * 1.1 * 100.0 + 0.5) / 100.0 AS o_totalprice,
               o_orderdate, o_orderpriority, 'U' AS op, 1 AS seq
        FROM orders WHERE o_orderkey % 7 = 0
    ),
    del AS (
        SELECT {_CDC_BASE_COLS}, 'D' AS op, 2 AS seq
        FROM orders WHERE o_orderkey % 11 = 0
    ),
    allr AS (
        SELECT * FROM base UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM del
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                     ORDER BY seq DESC, op DESC) AS rn
        FROM allr
    )
    SELECT {_CDC_BASE_COLS} FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
)
def q_merge_changes_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge-apply (Delta-MERGE semantics as union + latest-wins window):
    a derived change set — +10%-price upserts for keys ≡0 (mod 7), deletes for
    keys ≡0 (mod 11), deletes sequenced after upserts — applied onto the
    orders snapshot. Deletes win on overlapping keys (77, 154, …)."""
    from kda_flink_demo_spark.operators.cdc import apply_changes

    orders = load_table(spark, sf_dir, "orders")
    upd = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_totalprice", det_round(F.col("o_totalprice") * 1.1, 2))
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.lit(1))
    )
    dels = (
        orders.filter(F.col("o_orderkey") % 11 == 0)
        .withColumn("op", F.lit("D"))
        .withColumn("seq", F.lit(2))
    )
    return apply_changes(orders, upd.unionByName(dels), keys=["o_orderkey"])


@register(
    "dataset_profile",
    """
    SELECT 'event_id' AS column_name, count(*) AS n_rows,
           count(*) - count(event_id) AS n_nulls,
           count(DISTINCT CAST(event_id AS DOUBLE)) AS n_distinct,
           CAST(min(event_id) AS DOUBLE) AS min_num, CAST(max(event_id) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM events
    UNION ALL
    SELECT 'user_id', count(*), count(*) - count(user_id),
           count(DISTINCT CAST(user_id AS DOUBLE)),
           CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE), NULL, NULL
    FROM events
    UNION ALL
    SELECT 'value', count(*), count(*) - count(value), count(DISTINCT value),
           min(value), max(value), NULL, NULL
    FROM events
    UNION ALL
    SELECT 'event_type', count(*), count(*) - count(event_type),
           count(DISTINCT event_type), NULL, NULL, min(event_type), max(event_type)
    FROM events
    UNION ALL
    SELECT 'props', count(*), count(*) - count(props), count(DISTINCT props),
           NULL, NULL, min(props), max(props)
    FROM events
    """,
)
def q_dataset_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling (validation primitive): per-column row/null/exact-
    distinct counts + typed min/max over the events table. One melted scan per
    column family, grouped two-phase aggregate — see
    operators/aggregates.py:profile_columns for the 100 TB notes."""
    from kda_flink_demo_spark.operators.aggregates import profile_columns

    return profile_columns(
        load_table(spark, sf_dir, "events"),
        numeric_cols=["event_id", "user_id", "value"],
        string_cols=["event_type", "props"],
    )


@register(
    "events_interval_dedup",
    __import__(
        "kda_flink_demo_spark.operators.event_dedup", fromlist=["interval_dedup_oracle_sql"]
    ).interval_dedup_oracle_sql(interval_sec=86400),
)
def q_events_interval_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded event dedup (retry/re-delivery suppression): per
    (user_id, event_type), keep an arrival iff it is strictly more than one
    day past the previously KEPT arrival (the fixture's per-key cadence makes
    a day the interesting horizon: ~31% of arrivals are suppressed) — the greedy anchor chain, the
    batch twin of streaming dropDuplicatesWithinWatermark. One shuffle on the
    key; the per-key chain walks sequentially inside one Arrow task; the
    oracle advances every key's anchor per recursion step (recursive CTE +
    LATERAL)."""
    from kda_flink_demo_spark.operators.event_dedup import interval_dedup

    return interval_dedup(load_table(spark, sf_dir, "events"), interval_sec=86400)


@register(
    "asof_join_next_purchase",
    """
    WITH purchases AS (
        SELECT user_id, ts AS purchase_ts, max(event_id) AS purchase_id
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    ),
    clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, c.ts, p.purchase_ts, p.purchase_id
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.purchase_ts
    """,
)
def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (event attribution): every click gets the same
    user's EARLIEST purchase at or after the click instant (NULLs after the
    last purchase) — the mirror of asof_join_last_purchase, implemented as
    union + a reverse-ordered RUNNING last(ignorenulls) window (one shuffle,
    linear scan — never a shrinking CURRENT..FOLLOWING frame, which is O(n²)
    per key; operators/asof.py). Oracle: DuckDB's native forward ASOF
    (``c.ts <= p.purchase_ts``)."""
    from kda_flink_demo_spark.operators.asof import asof_join_forward

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("purchase_ts"))
        .agg(F.max("event_id").alias("purchase_id"))
    )
    return asof_join_forward(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="purchase_ts",
        payload_cols=["purchase_ts", "purchase_id"],
    )


@register(
    "session_windows_dynamic_gap",
    """
    WITH e AS (
        SELECT user_id, ts,
               ts + CASE WHEN event_type = 'purchase' THEN INTERVAL 10 MINUTE
                         ELSE INTERVAL 5 MINUTE END AS w_end
        FROM events
    ),
    m AS (
        SELECT user_id, ts, w_end,
               max(w_end) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        FROM e
    ),
    i AS (
        SELECT user_id, ts, w_end,
               sum(CASE WHEN prev_max IS NULL OR ts >= prev_max THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        FROM m
    )
    SELECT user_id, min(ts) AS session_start, max(w_end) AS session_end,
           count(*) AS n_events
    FROM i GROUP BY user_id, sid
    """,
)
def q_session_windows_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap session windows: each event holds its session open by its
    OWN gap (purchases 10 min, everything else 5) via Spark's expression-gap
    ``session_window``. The oracle is the prefix-max islands identity (an
    event opens a new session iff its ts ≥ the running max of earlier
    ts+gap) — proven equal to Spark's interval-merge semantics because a new
    session's first window end strictly exceeds every closed session's end."""
    from kda_flink_demo_spark.operators.windows import session_counts_dynamic_gap

    return session_counts_dynamic_gap(load_table(spark, sf_dir, "events"))


@register(
    "resample_1m_interp",
    """
    WITH agg AS (
        SELECT event_type, date_trunc('minute', ts) AS minute,
               floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS bucket_sum
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT date_trunc('minute', min(ts)) AS mn, date_trunc('minute', max(ts)) AS mx
               FROM events),
    minutes AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 MINUTE)) AS minute FROM bounds),
    grid AS (SELECT k.event_type, m.minute
             FROM minutes m CROSS JOIN (SELECT DISTINCT event_type FROM events) k),
    base AS (
        SELECT g.event_type, g.minute, a.bucket_sum,
               a.bucket_sum IS NOT NULL AS had_data
        FROM grid g LEFT JOIN agg a ON g.event_type = a.event_type AND g.minute = a.minute
    ),
    win AS (
        SELECT event_type, minute, bucket_sum, had_data,
               last_value(bucket_sum IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY minute
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
               epoch(last_value(CASE WHEN had_data THEN minute END IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY minute
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS prev_t,
               first_value(bucket_sum IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY minute
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
               epoch(first_value(CASE WHEN had_data THEN minute END IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY minute
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS next_t
        FROM base
    )
    SELECT event_type, minute,
           CASE WHEN had_data THEN bucket_sum
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                    floor((prev_v + (next_v - prev_v) *
                           ((epoch(minute) - prev_t) / (next_t - prev_t))) * 10000.0 + 0.5)
                        / 10000.0
                ELSE NULL END AS interp_sum,
           had_data
    FROM win
    """,
)
def q_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resampling on the span-bound minute grid: gap
    buckets take prev + (next−prev)·Δt/ΔT between the surrounding observed
    buckets (integer epoch-second fractions, pre-rounded endpoints — both
    engines run identical double arithmetic); no extrapolation past either
    end. Completes the time-series family next to ffill, as-of (both
    directions), and the event-time range join."""
    from kda_flink_demo_spark.operators.over_windows import resample_interp

    return resample_interp(load_table(spark, sf_dir, "events"))


@register(
    "multi_resolution_rollup",
    multi_resolution_rollup_oracle_sql(),
)
def q_multi_resolution_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: minute/hour/day counts+sums
    (plus grand total) from ONE scan via ROLLUP on the truncated-time
    hierarchy — one Expand + a single partial→final aggregate, the
    continuous-aggregate shape of time-series stores."""
    from kda_flink_demo_spark.operators.aggregates import multi_resolution_rollup

    return multi_resolution_rollup(load_table(spark, sf_dir, "events"))


@register(
    "anomaly_zscore",
    anomaly_zscore_oracle_sql(),
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection per event_type: flag events
    > 3σ from the mean of the previous 50 same-key events (self excluded,
    ≥ 20-event history). One key shuffle + one bounded-ROWS WindowExec — the
    monitoring twin of the reference's sliding OVER window."""
    from kda_flink_demo_spark.operators.over_windows import anomaly_zscore

    return anomaly_zscore(load_table(spark, sf_dir, "events"))


@register(
    "scd2_user_history",
    """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    kept AS (
        SELECT user_id, event_type, ts, event_id FROM ordered
        WHERE rn = 1 OR event_type IS DISTINCT FROM prev_type
    )
    -- event_id carried into the final window: the engine tie-breaks
    -- same-instant transitions on it, and the oracle must agree on ties
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           lead(ts) OVER w IS NULL AS is_current
    FROM kept
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 reconstruction: each user's event_type transitions as
    versioned validity intervals (valid_from / valid_to / is_current),
    consecutive no-change rows compressed away NULL-safely — the warehouse
    dimension-history pattern, one key shuffle + two window passes over the
    same sort."""
    from kda_flink_demo_spark.operators.cdc import scd2_history

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    return scd2_history(
        ev, keys=["user_id"], attr_cols=["event_type"], ts_col="ts", tie_col="event_id"
    )


def _zorder_oracle() -> str:
    from kda_flink_demo_spark.io.sinks import zorder_value_sql

    z = zorder_value_sql("qx", "qy", bits=10)
    return f"""
    WITH b AS (
        SELECT min(l_partkey) AS xmin, max(l_partkey) AS xmax,
               min(l_suppkey) AS ymin, max(l_suppkey) AS ymax
        FROM lineitem
    ),
    q AS (
        SELECT l_orderkey, l_linenumber,
               CAST(floor((l_partkey - xmin) * 1024.0 / (xmax - xmin + 1)) AS BIGINT) AS qx,
               CAST(floor((l_suppkey - ymin) * 1024.0 / (ymax - ymin + 1)) AS BIGINT) AS qy
        FROM lineitem, b
    )
    SELECT l_orderkey, l_linenumber, {z} AS zvalue, {z} >> 16 AS shard FROM q
    """


@register("zorder_layout", _zorder_oracle())
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) write layout: every lineitem row gets its interleaved
    (partkey, suppkey) z-value and a 16-way shard from the top 4 z bits — the
    OPTIMIZE-ZORDER-BY layout primitive as a map-only projection (no sampling
    pass, reproducible at any parallelism); per-shard min/max spans narrow on
    BOTH dimensions, asserted quantitatively in tests."""
    from kda_flink_demo_spark.io.sinks import zorder_layout

    li = load_table(spark, sf_dir, "lineitem")
    return zorder_layout(
        li, F.col("l_partkey"), F.col("l_suppkey"), bits=10, shard_bits=4
    ).select("l_orderkey", "l_linenumber", "zvalue", "shard")


@register(
    "incremental_agg_merge",
    f"""
    SELECT event_type, date_trunc('minute', ts) AS minute,
           count(value) AS cnt,
           floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS sum_value,
           min(value) AS min_value, max(value) AS max_value
    FROM events GROUP BY 1, 2
    """,
)
def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per-(type, minute)
    aggregate state of the full table computed as MERGE of three disjoint
    slices' states (simulating three daily ETL runs) — counts/sums add,
    min/max fold; the oracle recomputes from scratch, proving merge ≡
    recompute. The old slices' raw data is never rescanned in production;
    only aggregate rows shuffle."""
    from kda_flink_demo_spark.operators.aggregates import agg_state, merge_agg_states

    ev = load_table(spark, sf_dir, "events")
    slices = [
        agg_state(ev.filter(F.col("event_id") % 3 == i)) for i in range(3)
    ]
    merged = merge_agg_states(*slices, key_cols=("event_type", "minute"))
    return merged.select(
        "event_type",
        "minute",
        "cnt",
        det_round(F.col("sum_value"), 4).alias("sum_value"),
        "min_value",
        "max_value",
    )


def _trend_oracle() -> str:
    from kda_flink_demo_spark.operators.trend import trend_forecast_oracle_sql

    return trend_forecast_oracle_sql()


@register("trend_forecast_by_type", _trend_oracle())
def q_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key linear trend + next-minute forecast over minute-bucketed event
    counts: OLS from INTEGER sufficient statistics (n, Σx, Σy, Σxy, Σx² —
    exact at any aggregation order, no rounding needed anywhere), closed-form
    division as the only float step, NULL slope for degenerate single-bucket
    keys. Capacity-planning / anomaly-baseline readout."""
    from kda_flink_demo_spark.operators.trend import trend_forecast

    return trend_forecast(load_table(spark, sf_dir, "events"))


@register(
    "temporal_scd2_join",
    """
    WITH src AS (
        SELECT user_id, event_type, ts, event_id FROM events WHERE event_id % 2 = 0
    ),
    ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM src
    ),
    kept AS (
        SELECT user_id, event_type, ts, event_id FROM ordered
        WHERE rn = 1 OR event_type IS DISTINCT FROM prev_type
    ),
    hist AS (
        SELECT user_id, event_type AS state_at_event, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        FROM kept
    ),
    facts AS (
        SELECT event_id, user_id, event_type, ts FROM events WHERE event_id % 2 = 1
    )
    SELECT f.event_id, f.user_id, f.event_type, f.ts, h.state_at_event
    FROM facts f LEFT JOIN hist h
      ON f.user_id = h.user_id
     AND f.ts >= h.valid_from
     AND (h.valid_to IS NULL OR f.ts < h.valid_to)
    """,
)
def q_temporal_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature join: transactions (odd event_ids) pick up the
    user's profile state (SCD2 history of the even event_ids) valid AT each
    transaction's timestamp — the feature-store correctness shape (joining
    'current' attributes would leak the future into training data). LEFT
    join on the user key with the validity interval as a join filter; facts
    before a user's first profile state keep NULL. Disjoint SCD2 intervals
    guarantee ≤1 match per fact (fact count preserved, tested)."""
    from kda_flink_demo_spark.operators.cdc import scd2_history, temporal_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    hist = scd2_history(
        ev.filter(F.col("event_id") % 2 == 0),
        keys=["user_id"],
        attr_cols=["event_type"],
        ts_col="ts",
        tie_col="event_id",
    ).withColumnRenamed("event_type", "state_at_event")
    facts = ev.filter(F.col("event_id") % 2 == 1)
    return temporal_join(
        facts, hist, keys=["user_id"], fact_ts="ts", attr_cols=("state_at_event",)
    )


_DQ_ORACLE = """
    SELECT 'orders_custkey_not_null' AS check_name,
           CAST(count(*) AS BIGINT) AS n_checked,
           CAST(coalesce(sum(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END), 0) AS BIGINT) AS n_violations,
           coalesce(sum(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END), 0) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'orders_totalprice_positive', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END), 0) AS BIGINT),
           coalesce(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END), 0) = 0
    FROM orders
    UNION ALL
    SELECT 'orders_status_domain', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END), 0) AS BIGINT),
           coalesce(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END), 0) = 0
    FROM orders
    UNION ALL
    SELECT 'orders_priority_expected_domain', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM') THEN 0 ELSE 1 END), 0) AS BIGINT),
           coalesce(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM') THEN 0 ELSE 1 END), 0) = 0
    FROM orders
    UNION ALL
    SELECT 'lineitem_discount_in_unit_range', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN l_discount BETWEEN 0 AND 1 THEN 0 ELSE 1 END), 0) AS BIGINT),
           coalesce(sum(CASE WHEN l_discount BETWEEN 0 AND 1 THEN 0 ELSE 1 END), 0) = 0
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_quantity_positive', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN l_quantity > 0 THEN 0 ELSE 1 END), 0) AS BIGINT),
           coalesce(sum(CASE WHEN l_quantity > 0 THEN 0 ELSE 1 END), 0) = 0
    FROM lineitem
    UNION ALL
    SELECT 'orders_orderkey_unique', CAST(coalesce(sum(c), 0) AS BIGINT), CAST(coalesce(sum(c - 1), 0) AS BIGINT),
           coalesce(sum(c - 1), 0) = 0
    FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'lineitem_pk_unique', CAST(coalesce(sum(c), 0) AS BIGINT), CAST(coalesce(sum(c - 1), 0) AS BIGINT),
           coalesce(sum(c - 1), 0) = 0
    FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)
    UNION ALL
    SELECT 'orders_custkey_references_customer',
           (SELECT CAST(count(*) AS BIGINT) FROM orders),
           (SELECT CAST(count(*) AS BIGINT) FROM orders o
            WHERE o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o.o_custkey)),
           (SELECT count(*) FROM orders o
            WHERE o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o.o_custkey)) = 0
    UNION ALL
    SELECT 'lineitem_orderkey_references_orders',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
            WHERE l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l.l_orderkey)),
           (SELECT count(*) FROM lineitem l
            WHERE l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l.l_orderkey)) = 0
"""


@register("data_quality_checks", _DQ_ORACLE)
def q_data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite (Deequ/dbt-test shape,
    operators/validation.py): since the r13 optimization round each fact
    table is scanned exactly ONCE — the row-rule and FK-orphan conditional
    sums ride the PK-uniqueness key aggregate as extra per-key counters
    (fused_table_checks), where the separate builders paid four reads per
    table (rules, uniqueness, FK projection, FK row count). Report rows and
    counts are identical to the unfused builders (test-pinned). Emits
    violation COUNTS, not just pass/fail — the priority-domain rule is
    deliberately narrower than the fixture's domain so non-zero violation
    paths are exercised and hash-checked."""
    from kda_flink_demo_spark.operators.validation import (
        check_suite,
        fused_table_checks,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return check_suite(
        fused_table_checks(
            orders,
            {
                "orders_custkey_not_null": F.col("o_custkey").isNotNull(),
                "orders_totalprice_positive": F.col("o_totalprice") > 0,
                "orders_status_domain": F.col("o_orderstatus").isin("O", "F", "P"),
                "orders_priority_expected_domain": F.col("o_orderpriority").isin(
                    "1-URGENT", "2-HIGH", "3-MEDIUM"
                ),
            },
            ["o_orderkey"],
            "orders_orderkey_unique",
            fk=(customer, "o_custkey", "c_custkey", "orders_custkey_references_customer"),
        ),
        fused_table_checks(
            lineitem,
            {
                "lineitem_discount_in_unit_range": F.col("l_discount").between(0, 1),
                "lineitem_quantity_positive": F.col("l_quantity") > 0,
            },
            ["l_orderkey", "l_linenumber"],
            "lineitem_pk_unique",
            fk=(orders, "l_orderkey", "o_orderkey", "lineitem_orderkey_references_orders"),
        ),
    )


_QUARANTINE_ORACLE = """
    WITH tagged AS (
        SELECT o_orderkey,
               array_to_string(list_filter([
                   CASE WHEN o_custkey IS NOT NULL THEN NULL ELSE 'custkey_not_null' END,
                   CASE WHEN o_totalprice > 0 THEN NULL ELSE 'totalprice_positive' END,
                   CASE WHEN o_orderstatus IN ('O','F','P') THEN NULL ELSE 'status_domain' END,
                   CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM') THEN NULL
                        ELSE 'priority_expected_domain' END
               ], x -> x IS NOT NULL), ',') AS violations
        FROM orders
    )
    SELECT o_orderkey,
           CASE WHEN coalesce(violations, '') = '' THEN 'good' ELSE 'quarantined' END AS split,
           coalesce(violations, '') AS violations
    FROM tagged
"""


@register("quarantine_gate", _QUARANTINE_ORACLE)
def q_quarantine_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming dead-letter gate
    (streaming/standing_stores.py: update_quarantine_store): the SAME rule
    dictionary style as data_quality_checks, enforced row-level via
    validation.quarantine_split — passing rows tagged 'good', violating rows
    'quarantined' with a CSV of every failed rule (rule order = declaration
    order on both engines). One map-side projection, both branches prune from
    a single scan, no shuffle at any scale. The narrow priority domain
    guarantees a non-empty quarantine branch, so both paths are hash-checked."""
    from kda_flink_demo_spark.operators.validation import quarantine_split

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )
    rules = {
        "custkey_not_null": F.col("o_custkey").isNotNull(),
        "totalprice_positive": F.col("o_totalprice") > 0,
        "status_domain": F.col("o_orderstatus").isin("O", "F", "P"),
        "priority_expected_domain": F.col("o_orderpriority").isin(
            "1-URGENT", "2-HIGH", "3-MEDIUM"
        ),
    }
    good, bad = quarantine_split(orders, rules)
    return good.select(
        "o_orderkey", F.lit("good").alias("split"), F.lit("").alias("violations")
    ).unionByName(
        bad.select(
            "o_orderkey",
            F.lit("quarantined").alias("split"),
            F.array_join("violations", ",").alias("violations"),
        )
    )


@register(
    "sketch_incremental_pack",
    """
    WITH ex AS (
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_ids_exact
        FROM events GROUP BY 1
    ),
    anchor AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    ov AS (
        SELECT e.event_type,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS ids_also_in_anchor_exact
        FROM events e JOIN anchor a ON e.user_id = a.user_id
        GROUP BY 1
    )
    SELECT ex.event_type,
           ex.distinct_ids_exact,
           coalesce(ov.ids_also_in_anchor_exact, 0) AS ids_also_in_anchor_exact,
           TRUE AS hll_within_5pct,
           TRUE AS theta_within_5pct
    FROM ex LEFT JOIN ov ON ex.event_type = ov.event_type
    """,
)
def q_sketch_incremental_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable sketch analytics (DataSketches HLL + Theta): three disjoint
    event slices' sketch states merged into per-type distinct-user estimates
    and the Theta-intersection overlap with the purchase audience — the
    constant-size-state twin of incremental_agg_merge.

    Hash-checkable (r05 VERDICT directive): HLL/Theta unions here are
    DETERMINISTIC and merge-order-independent (pinned bit-exactly by local
    tests + the determinism probe), so the query emits the EXACT per-key
    distinct counts (one extra aggregate over the same events) alongside
    deliberately-boolean ``*_within_5pct`` accuracy verdicts of the sketch
    estimates against them. The oracle recomputes the exact columns in
    DuckDB and pins both booleans TRUE — a wrong sketch estimate flips a
    boolean and fails the hash, so the sketch pipeline itself is externally
    verified without requiring DuckDB to reproduce DataSketches binaries.
    (The randomized-KLL quantile sketch stays excluded from this contract.)"""
    from kda_flink_demo_spark.operators.sketches import (
        merge_sketch_states,
        sketch_report,
        sketch_state,
    )

    ev = load_table(spark, sf_dir, "events")
    slices = [sketch_state(ev.filter(F.col("event_id") % 3 == i)) for i in range(3)]
    # AUDITED r14 (the pq_index_build double-execution pattern): sketch_report
    # consumes the merged table twice (broadcast anchor + main rows), so a
    # localCheckpoint here was tried. It cut the job count 16 → 14 but
    # measured consistently SLOWER in wall (0.63 → 0.71 s BABA at matched
    # calibs): AQE's runtime exchange reuse already shares the merged
    # aggregate between the two consumers, so the checkpoint only added a
    # hard materialization barrier + driver round-trips. Rejected; the
    # single-plan shape stays.
    report = sketch_report(merge_sketch_states(*slices))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_ids_exact")
    )
    anchor_users = (
        ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    overlap = (
        ev.join(anchor_users, "user_id", "left_semi")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("ids_also_in_anchor_exact"))
    )
    within = lambda est, ex: (  # noqa: E731
        F.abs(F.col(est).cast("double") - F.col(ex)) <= 0.05 * F.col(ex)
    )
    return (
        report.join(exact, "event_type")
        .join(overlap, "event_type", "left")
        # coalesce BEFORE the accuracy comparison: an event type with zero
        # anchor overlap has no overlap row, and abs(est − NULL) ≤ 0.05·NULL
        # would emit a NULL boolean where the oracle pins TRUE
        .withColumn(
            "ids_also_in_anchor_exact",
            F.coalesce("ids_also_in_anchor_exact", F.lit(0).cast("long")),
        )
        .select(
            "event_type",
            "distinct_ids_exact",
            "ids_also_in_anchor_exact",
            within("distinct_ids", "distinct_ids_exact").alias("hll_within_5pct"),
            within("ids_also_in_anchor", "ids_also_in_anchor_exact").alias(
                "theta_within_5pct"
            ),
        )
    )

@register(
    "quantile_sketch_report",
    """
    SELECT event_type, count(*) AS n,
           floor(quantile_cont(value, 0.50) * 1000000.0 + 0.5) / 1000000.0 AS p50_exact,
           TRUE AS p50_ok,
           floor(quantile_cont(value, 0.95) * 1000000.0 + 0.5) / 1000000.0 AS p95_exact,
           TRUE AS p95_ok,
           floor(quantile_cont(value, 0.99) * 1000000.0 + 0.5) / 1000000.0 AS p99_exact,
           TRUE AS p99_ok
    FROM events GROUP BY 1
    """,
)
def q_quantile_sketch_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch readout made hash-checkable (the approx_distinct /
    sketch_incremental template applied to rank statistics): exact
    interpolated p50/p95/p99 per event type (oracle-verified against DuckDB
    quantile_cont) plus booleans pinning Greenwald–Khanna percentile_approx
    inside the exact quantile envelope [Q(p−ε), Q(p+ε)], ε = 2/accuracy —
    guaranteed by GK's published rank-error bound, so the oracle pins TRUE.
    GK is deterministic (unlike KLL, which stays excluded); sketch state is
    O(accuracy·log n) per key, merged associatively in one partial→final
    aggregate."""
    from kda_flink_demo_spark.operators.sketches import quantile_sketch_report

    return quantile_sketch_report(load_table(spark, sf_dir, "events"))


def _cms_oracle() -> str:
    from kda_flink_demo_spark.operators.sketches import cms_heavy_hitters_oracle_sql

    return cms_heavy_hitters_oracle_sql(k=25, depth=4, width=512)


@register("cms_heavy_hitters", _cms_oracle())
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters over the document corpus — the
    mergeable FREQUENCY sketch next to the HLL/Theta distinct states
    (sketch_incremental_pack) and the GK rank states (quantile_sketch_report).
    Because the bucket hash is the cross-engine md5 idiom, the ESTIMATES
    themselves are oracle-recomputable integers — the whole row hash-checks,
    not just pinned booleans. Top-25 exact terms, each with its CMS estimate,
    integer overcount, and the εN-bound boolean (ε = e/width)."""
    from kda_flink_demo_spark.operators.sketches import cms_heavy_hitters_report

    return cms_heavy_hitters_report(load_table(spark, sf_dir, "documents"))


_DRIFT_ORACLE = """
    WITH new_docs AS (
        SELECT * FROM documents WHERE lang <> 'zh'
    ),
    old_rows AS (
        SELECT 'lang' AS dim, lang AS bucket FROM documents
        UNION ALL
        SELECT 'len_pow2',
               CAST(length(format('{:b}', len(string_split(text, ' ')))) - 1 AS VARCHAR)
        FROM documents
    ),
    new_rows AS (
        SELECT 'lang' AS dim, lang AS bucket FROM new_docs
        UNION ALL
        SELECT 'len_pow2',
               CAST(length(format('{:b}', len(string_split(text, ' ')))) - 1 AS VARCHAR)
        FROM new_docs
    ),
    counted AS (
        SELECT dim, bucket,
               sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS old_cnt,
               sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS new_cnt
        FROM (
            SELECT dim, bucket, 0 AS t FROM old_rows
            UNION ALL
            SELECT dim, bucket, 1 AS t FROM new_rows
        )
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT dim, bucket, old_cnt, new_cnt,
               (old_cnt + 1) / (sum(old_cnt) OVER (PARTITION BY dim)
                                + count(*) OVER (PARTITION BY dim)) AS of,
               (new_cnt + 1) / (sum(new_cnt) OVER (PARTITION BY dim)
                                + count(*) OVER (PARTITION BY dim)) AS nf
        FROM counted
    ),
    per_bucket AS (
        SELECT dim, bucket,
               CAST(old_cnt AS BIGINT) AS old_cnt,
               CAST(new_cnt AS BIGINT) AS new_cnt,
               floor(of * 1000000.0 + 0.5) / 1000000.0 AS old_frac,
               floor(nf * 1000000.0 + 0.5) / 1000000.0 AS new_frac,
               CAST(floor((nf - of) * ln(nf / of) * 1000000.0 + 0.5) AS BIGINT)
                   AS psi_micro
        FROM tot
    )
    SELECT dim, bucket, old_cnt, new_cnt, old_frac, new_frac, psi_micro,
           CAST(sum(psi_micro) OVER (PARTITION BY dim) AS BIGINT) AS dim_psi_micro,
           CAST(sum(psi_micro) OVER (PARTITION BY dim) AS BIGINT) >= 200000 AS drifted
    FROM per_bucket
"""


@register("corpus_drift_report", _DRIFT_ORACLE)
def q_corpus_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two corpus snapshots (PSI, the ML-monitoring
    standard): per (dimension, bucket) counts, smoothed proportions, and
    integer-micro PSI terms whose per-dimension sum is order-free — the
    refresh gate next to data_quality_checks. The synthesized new snapshot
    drops lang='zh' entirely (a REAL planted drift the report must flag) while
    the length mix barely moves (a non-drift the report must NOT flag)."""
    from kda_flink_demo_spark.operators.validation import distribution_drift

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("lang") != "zh")
    n = F.size(F.split(F.col("text"), " ")).cast("long")
    dims = {
        "lang": F.col("lang"),
        "len_pow2": (F.length(F.bin(n)) - 1).cast("long"),
    }
    return distribution_drift(docs, new, dims)
