"""Corpus-trained bigram language-model scoring — the perplexity-style
quality filter of pretraining pipelines (CCNet/KenLM-shaped), self-trained:
the LM is estimated from the corpus being scored, so the operator needs no
external model artifact.

Per document: the average negative log-likelihood of its token bigrams under
maximum-likelihood bigram probabilities P(w2|w1) = c(w1,w2) / c(w1), where the
counts are corpus-wide occurrence counts (with multiplicity — this is an LM,
not a shingle set). High avg-NLL = surprising/incoherent text; pipelines drop
the tail.

Scale shape (r13): the corpus explodes to (doc, w1, w2) positions for the
bigram-count aggregate (map-side partial combine; shuffled width = the bigram
vocabulary, ≪ corpus) and once more for scoring; the unigram table is the
MARGINAL of the bigram table (Σ_w2 c2 — integer-exact), so it never touches
the corpus, and both counts pre-join into one (w1, w2) → nll lookup the
position stream joins ONCE. ``join_on_hash`` swaps the join keys for xxhash64 longs
(fixed 8-byte shuffle width) — same counts up to a ~2⁻⁶⁴ collision; the
default stays on strings so the DuckDB oracle is collision-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kda_flink_demo_spark.functions import det_round, det_round_sql, spread_for_compute


def _bigram_positions(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) per bigram POSITION (multiplicity preserved). Built with
    arrays_zip of two token-array slices — three evaluations of the split
    instead of two per token position (the element_at-per-position shape
    re-inlines the split under CollapseProject; measured 10× slower on the
    span operator before the same fix)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    pairs = F.when(
        n >= 2, F.arrays_zip(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1))
    ).otherwise(F.array().cast("array<struct<`0`:string,`1`:string>>"))
    spread = spread_for_compute(df)
    return spread.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        F.col(id_col), F.col("p.0").alias("w1"), F.col("p.1").alias("w2")
    )


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    join_on_hash: bool = False,
) -> DataFrame:
    """Per-doc (n_bigrams, avg_nll) under the corpus-trained bigram MLE.

    Docs with fewer than 2 tokens have no bigrams and are absent from the
    output (matches the oracle's empty range). ``avg_nll`` is det_round-ed:
    the per-position ln is computed on identical doubles in both engines and
    the 4-digit rounding absorbs summation-order ULP drift (same contract as
    ``tfidf_top_terms``).
    """
    bg = _bigram_positions(df, text_col, id_col)
    if join_on_hash:
        bg = bg.select(
            F.col(id_col),
            F.xxhash64(F.col("w1")).alias("w1"),
            F.xxhash64(F.concat_ws("\x1f", "w1", "w2")).alias("w2"),
        )
    # Optimization r13 (guide §2.3/§2.4): the unigram count is the marginal of
    # the bigram count — c1(w1) = Σ_w2 c2(w1, w2), integer-exact — so it is a
    # window sum OVER the VOCABULARY-sized c2 table instead of a second
    # corpus-wide explode + aggregate (a groupBy+self-join spelling would
    # duplicate the whole c2 subtree in the plan; the window keeps it single).
    # Both counts collapse into one (w1, w2) → nll lookup the position stream
    # joins ONCE, so the corpus is exploded twice (counts pass + scoring pass)
    # and joined once, where the old plan exploded it three times and joined
    # it twice. nll values are the identical doubles (same c2/c1 integers
    # feeding the same ln()).
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = F.sum("c2").over(Window.partitionBy("w1"))
    nll_table = c2.select(
        "w1", "w2", (-F.log(F.col("c2") / c1)).alias("_nll")
    )
    return (
        bg.join(nll_table, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg("_nll").alias("_avg"),
        )
        .select(id_col, "n_bigrams", det_round(F.col("_avg"), 4).alias("avg_nll"))
    )


def bigram_lm_score_oracle_sql(table: str = "documents") -> str:
    """DuckDB twin: parallel unnest zips the two slice lists positionally."""
    avg = det_round_sql("avg_nll_raw", 4)
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM {table}),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
               unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
        FROM t
    ),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
    per AS (
        SELECT bg.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               avg(-ln(c2.c2 / CAST(c1.c1 AS DOUBLE))) AS avg_nll_raw
        FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        GROUP BY 1
    )
    SELECT doc_id, n_bigrams, {avg} AS avg_nll FROM per
    """
