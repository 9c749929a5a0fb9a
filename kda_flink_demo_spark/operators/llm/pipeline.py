"""The composed corpus filter pipeline: length gate → exact-substring
duplication gate → quality gate, with a per-document verdict.

This is the end-to-end shape a pretraining data pipeline actually runs —
individual operators (token_stats, duplicate_spans, quality_score) matter
because they compose into one pass that labels every document `kept` or the
FIRST reason it was dropped. Composing them here (instead of three separate
jobs) means the corpus is scanned once for the narrow per-row stages; the only
shuffles are the two inside duplicate_spans (span key, then doc_id) plus the
doc_id join of its tiny per-doc stats back onto the stream.

Stage precedence is part of the contract: a too-short doc reports
`too_short` even if it would also fail quality — downstream accounting
("how many tokens did each filter cost us?") depends on a deterministic
first-failure attribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kda_flink_demo_spark.functions import det_round, det_round_sql
from kda_flink_demo_spark.operators.llm.dedup import (
    duplicate_spans,
    duplicate_spans_oracle_sql,
)
from kda_flink_demo_spark.operators.llm.text import quality_columns


def filter_pipeline(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 25,
    span: int = 10,
    dup_span_threshold: float = 0.5,
    quality_threshold: float = 0.5,
) -> DataFrame:
    """Label every document `kept` or its first failing filter:

    1. ``too_short``        — fewer than ``min_tokens`` whitespace tokens;
    2. ``duplicated_spans`` — ≥ ``dup_span_threshold`` of its ``span``-token
       windows occur in other documents too (exact-substring duplication à la
       Lee et al. 2021; both members of a duplicate relationship are flagged —
       canonical-survivor selection is ``apply_dedup``'s job);
    3. ``low_quality``      — composite quality heuristic below
       ``quality_threshold``;
    4. ``kept``             — otherwise.

    All threshold comparisons are on ``det_round``-ed values so the verdict is
    engine-independent even exactly at a boundary.
    """
    qc = quality_columns(F.col(text_col))
    base = df.select(
        F.col(id_col),
        qc["n_tokens"].alias("n_tokens"),
        det_round(qc["quality"], 4).alias("quality"),
    )
    spans = duplicate_spans(df, text_col=text_col, id_col=id_col, span=span).select(
        F.col(id_col), F.col("dup_span_ratio")
    )
    joined = base.join(spans, id_col, "left").withColumn(
        "dup_span_ratio", F.coalesce(F.col("dup_span_ratio"), F.lit(0.0))
    )
    verdict = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("dup_span_ratio") >= dup_span_threshold, F.lit("duplicated_spans"))
        .when(F.col("quality") < quality_threshold, F.lit("low_quality"))
        .otherwise(F.lit("kept"))
    )
    return joined.select(
        id_col, "n_tokens", "quality", "dup_span_ratio", verdict.alias("verdict")
    )


def filter_pipeline_oracle_sql(
    min_tokens: int = 25,
    span: int = 10,
    dup_span_threshold: float = 0.5,
    quality_threshold: float = 0.5,
    table: str = "documents",
) -> str:
    """DuckDB twin: same quality expression (QUALITY_ORACLE_SQL's body), same
    span statistics (duplicate_spans_oracle_sql inlined as a CTE), same rounded
    thresholds and precedence."""
    quality = det_round_sql(
        """0.4 * least(n_toks / 64.0, 1.0)
           + 0.3 * least((stop_hits / n_toks) * 4, 1.0)
           + 0.3 * (1 - least((punct / greatest(n_chars, 1)) * 10, 1.0))""",
        4,
    )
    span_sql = duplicate_spans_oracle_sql(span=span, table=table)
    return rf"""
    WITH spanstats AS ({span_sql}),
    q AS (
        SELECT doc_id, n_toks AS n_tokens, {quality} AS quality
        FROM (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(list_filter(string_split(lower(text), ' '),
                        t -> t IN ('the', 'and', 'of', 'to', 'a', 'in', 'is')))
                        AS BIGINT) AS stop_hits,
                   CAST(len(regexp_extract_all(text, '[^\w\s]')) AS BIGINT) AS punct
            FROM {table}
        )
    )
    SELECT q.doc_id, q.n_tokens, q.quality,
           coalesce(s.dup_span_ratio, 0.0) AS dup_span_ratio,
           CASE WHEN q.n_tokens < {min_tokens} THEN 'too_short'
                WHEN coalesce(s.dup_span_ratio, 0.0) >= {dup_span_threshold}
                    THEN 'duplicated_spans'
                WHEN q.quality < {quality_threshold} THEN 'low_quality'
                ELSE 'kept' END AS verdict
    FROM q LEFT JOIN spanstats s ON q.doc_id = s.doc_id
    """
