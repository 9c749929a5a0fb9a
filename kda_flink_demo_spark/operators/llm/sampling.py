"""Corpus-mixing operators: deterministic temperature resampling across
sources.

Pretraining mixes heterogeneous sources; sampling each source with probability
∝ count^α (α < 1) flattens the mixture toward the small sources ("temperature
sampling", e.g. multilingual pretraining mixes). The acceptance decision must
be DETERMINISTIC — the same doc is kept on every run, every engine, every
partitioning — so it hashes the document id, never calls rand().

Scale shape: the per-source count is a partial→final aggregate that produces
one row per source (a handful), broadcast back onto the corpus; the filter
itself is map-side. The 100 TB corpus is scanned once and never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^32 — the md5-prefix uniform lives in [0, 2^32); scaling an acceptance
# probability by a power of two is float-exact, so the integer threshold is
# bit-identical across engines.
_HASH_SPACE = 4294967296.0


def temperature_resample(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Deterministically subsample each source so surviving counts ∝ n_src^α.

    Acceptance probability per source: p_s = (n_min / n_s)^(1-α) — the
    smallest source is kept in full, larger sources are thinned toward the
    tempered mixture. A doc survives iff the first 8 hex digits of
    md5(doc_id) — a uniform 32-bit integer, the same deterministic-sampling
    primitive as ``deterministic_sample`` — fall below floor(p_s · 2^32).

    α = 0.5 (the default) computes p_s via ``sqrt``, which IEEE 754 requires
    to be correctly rounded — the Spark and DuckDB doubles are bit-identical
    and the integer thresholds can never disagree. Other α go through
    ``pow``, which carries a (documented, tested-in-practice) cross-libm ULP
    caveat at the acceptance boundary.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_src"))
    n_min = counts.agg(F.min("n_src").alias("n_min"))
    ratio = F.col("n_min") / F.col("n_src")
    if alpha == 0.5:
        p = F.sqrt(ratio)
    else:
        p = F.pow(ratio, F.lit(1.0 - alpha))
    thresholds = counts.crossJoin(F.broadcast(n_min)).select(
        source_col, F.floor(p * F.lit(_HASH_SPACE)).cast("long").alias("keep_below")
    )
    u = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("long")
    return (
        df.join(F.broadcast(thresholds), source_col)
        .filter(u < F.col("keep_below"))
        .select(id_col, source_col)
    )


def temperature_resample_oracle_sql(
    alpha: float = 0.5, source_col: str = "source", table: str = "documents"
) -> str:
    """DuckDB twin of the α = 0.5 path (sqrt is correctly rounded in both
    engines, so thresholds match bit-for-bit)."""
    if alpha != 0.5:
        raise ValueError("oracle registered only for the sqrt (alpha=0.5) path")
    return f"""
    WITH c AS (SELECT {source_col}, count(*) AS n_src FROM {table} GROUP BY 1),
    m AS (SELECT min(n_src) AS n_min FROM c),
    t AS (
        SELECT {source_col},
               CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_src) * 4294967296.0) AS BIGINT)
                   AS keep_below
        FROM c, m
    )
    SELECT d.doc_id, d.{source_col}
    FROM {table} d JOIN t USING ({source_col})
    WHERE CAST(concat('0x', substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          < t.keep_below
    """
