"""Embedding storage/compression operators.

``quantize_embeddings`` — symmetric int8 scalar quantization, the standard
4× storage compression for ANN indexes (FAISS ``SQ8``-style): per-vector
scale = max|v| / 127, codes = round-half-up(v / scale), reconstruction
error reported as per-vector MSE.

All JVM-side array expressions (transform / zip_with / aggregate) — no
Python in the data path, no shuffle: a narrow per-row projection that runs at
scan speed at any scale. The same arithmetic is expressible in DuckDB list
functions, so the operator is fully oracle-checked (sequential-fold MSE sum on
both sides; det_round absorbs nothing here beyond display width, but keeps the
hash comparison stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kda_flink_demo_spark.functions import det_round, det_round_sql


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    head: int = 8,
) -> DataFrame:
    """Per-vector symmetric int8 quantization + reconstruction MSE.

    codes = floor(v/scale + 0.5) — explicit half-up so Spark and the oracle
    round identically (no banker's rounding); |v| ≤ max|v| ⇒ codes already lie
    in [-127, 127], no clamp needed. All-zero vectors get scale 0 and all-zero
    codes (guarded — 0/0 would be NaN and ANSI would reject the cast).

    Output: (id, scale, mse, q_head) with ``q_head`` the first ``head`` codes
    as a comma string (raw array columns break hash comparators; the full code
    array is an internal column callers can re-derive).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col), v.alias("_v")).withColumn(
        "_scale", F.array_max(F.transform("_v", F.abs)) / F.lit(127.0)
    )
    qc = F.when(
        F.col("_scale") > 0,
        F.transform("_v", lambda x: F.floor(x / F.col("_scale") + F.lit(0.5)).cast("long")),
    ).otherwise(F.transform("_v", lambda x: F.lit(0).cast("long")))
    base = base.withColumn("_qc", qc)
    err_terms = F.zip_with(
        "_v", "_qc", lambda x, q: (x - q * F.col("_scale")) * (x - q * F.col("_scale"))
    )
    mse = F.aggregate(err_terms, F.lit(0.0), lambda acc, e: acc + e) / F.size("_v")
    return base.select(
        F.col(id_col),
        det_round(F.col("_scale"), 9).alias("scale"),
        det_round(mse, 12).alias("mse"),
        F.concat_ws(
            ",", F.transform(F.slice("_qc", 1, head), lambda x: x.cast("string"))
        ).alias("q_head"),
    )


QUANTIZE_ORACLE_SQL = f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM v),
    q AS (SELECT vec_id, v, scale,
            CASE WHEN scale > 0
                 THEN list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
                 ELSE list_transform(v, x -> 0::BIGINT) END AS qc
          FROM s)
    SELECT vec_id,
           {det_round_sql('scale', 9)} AS scale,
           {det_round_sql(
               '''list_reduce(
                      list_prepend(0.0::DOUBLE,
                          list_transform(list_zip(v, qc),
                              p -> (p[1] - p[2] * scale) * (p[1] - p[2] * scale))),
                      (acc, e) -> acc + e) / len(v)''',
               12,
           )} AS mse,
           array_to_string(qc[1:8], ',') AS q_head
    FROM q
"""
