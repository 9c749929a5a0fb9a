"""Distributed supervised model training: a tiny logistic-regression quality
classifier trained by full-batch gradient descent, DataFrame-native — the
CCNet/fastText-style learned quality filter of an LLM data pipeline, and the
engine's demonstration of distributed ITERATIVE SUPERVISED TRAINING next to
the unsupervised k-means (`kmeans.py`) and connected components
(`clustering.py`).

Everything is cross-engine bit-exact by construction (the kmeans recipe):

- **Features** — integer-derived ratios (chars/1000, words/100, constant
  bias): both engines produce identical doubles from identical integers.
- **Sigmoid** — the RATIONAL fast sigmoid ``0.5 + z / (2·(1+|z|))``: only
  +, ×, /, abs — IEEE-identical everywhere. ``exp`` is deliberately avoided:
  its last-ulp rounding is not guaranteed identical across engines, which
  would let round-k noise snowball into round-k+1 weights.
- **Gradient** — mean of ``(p − y)·x`` per feature: ONE map-side
  partial→final aggregate per round (the corpus never shuffles — only three
  partial cells per task), ``det_round(6)``-ed so parallel-sum fold-order
  noise (~1e-16 relative) cannot leak into the next round's weights.
- **Weights** — a 1-row DataFrame folded forward by broadcast; the whole
  fixed-round training is ONE declarative plan the driver never touches —
  no ``.collect()`` anywhere, same as kmeans' broadcast centroid row.

Scale shape (r13): ONE corpus featurization scan, eagerly materialized as
the compact (id, label, 4-double) feature table — the raw text is split and
stopword-counted exactly once, where the pre-r13 single-plan shape re-ran
the featurization inside every gradient round and the scoring pass (4
corpus-wide text scans). Per round: one feature-table scan (map-side
gradient partials) + a 1-row update; state between rounds is 4 doubles.
Scoring is a map-side projection against the broadcast final weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kda_flink_demo_spark.functions import det_round, det_round_sql

_FEATS = ("b", "x1", "x2", "x3")  # bias, chars/1000, words/100, en-stopword ratio


def _features(df: DataFrame, text_col: str, label_expr) -> DataFrame:
    from kda_flink_demo_spark.operators.llm.text import LANG_STOPWORDS, _stopword_count

    # NULL normalization mirrors the oracle EXACTLY (both spelled with
    # explicit coalesce): a NULL label counts as a negative (never a dropped
    # row — Spark's avg would skip y=NULL while DuckDB's CASE keeps it), and
    # NULL text behaves as '' (Spark's legacy size(NULL) = −1 vs DuckDB's
    # NULL would otherwise feed different gradients per engine).
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.size(F.split(text, " "))
    sw = _stopword_count(text, LANG_STOPWORDS["en"])
    return df.select(
        "doc_id",
        F.coalesce(label_expr.cast("double"), F.lit(0.0)).alias("y"),
        F.lit(1.0).alias("b"),
        (F.coalesce(F.col("n_chars"), F.lit(0)) / F.lit(1000.0)).alias("x1"),
        (toks / F.lit(100.0)).alias("x2"),
        # integer/integer division: identical doubles in both engines; the
        # exact-token stopword count is the proven cross-engine spelling
        # (text.py — \b-regex counting diverges between Java and RE2)
        (sw / toks).alias("x3"),
    )


def _p_col():
    """Rational fast sigmoid of the linear score, weights taken from the
    joined 1-row weight columns w0..w{k-1} (left-to-right addition order —
    the oracle spells the sum identically)."""
    z = None
    for i, c in enumerate(_FEATS):
        term = F.col(f"w{i}") * F.col(c)
        z = term if z is None else z + term
    return F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))


def logreg_quality_score(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    label_value: str = "en",
    rounds: int = 3,
    lr: float = 1.0,
) -> DataFrame:
    """Train ``rounds`` of full-batch gradient descent predicting
    ``label_col == label_value`` from length features, then score every
    document: ``(doc_id, score, predicted, label)``. Fixed small round count
    → one declarative plan (kmeans precedent); see module docstring for the
    bit-exactness recipe."""
    # Optimization r13 (guide §1.2/§5 — don't recompute what one pass can
    # materialize): the feature table is 5 doubles + id per row (≪ the raw
    # text), but it was re-derived — full text split + exact stopword count —
    # inside EVERY gradient round's subtree and once more for scoring (4
    # corpus-wide featurization passes, and a plan tree that re-nested the
    # featurization per round, dominating construction time). One eager
    # localCheckpoint materializes it once; every round now scans the compact
    # feature rows. Values are the identical doubles (the checkpoint only
    # materializes them), pinned by test_logreg_checkpointed_features_
    # identical_scores.
    feats = _features(df, text_col, F.col(label_col) == F.lit(label_value)).localCheckpoint()
    k = len(_FEATS)
    w = df.sparkSession.range(1).select(
        *[F.lit(0.0).alias(f"w{i}") for i in range(k)]
    )
    for _ in range(rounds):
        joined = feats.crossJoin(F.broadcast(w))
        p = _p_col()
        grads = joined.agg(
            *[
                det_round(F.avg((p - F.col("y")) * F.col(c)), 6).alias(f"g_{c}")
                for c in _FEATS
            ],
            # carry the (single-row-constant) weights through the aggregate
            *[F.first(f"w{i}").alias(f"w{i}") for i in range(k)],
        )
        w = grads.select(
            *[
                det_round(
                    F.col(f"w{i}") - F.lit(lr) * F.col(f"g_{c}"), 6
                ).alias(f"w{i}")
                for i, c in enumerate(_FEATS)
            ]
        )
    scored = feats.crossJoin(F.broadcast(w))
    p = _p_col()
    return scored.select(
        "doc_id",
        det_round(p, 6).alias("score"),
        (det_round(p, 6) >= 0.5).alias("predicted"),
        (F.col("y") == 1.0).alias("label"),
    )


def logreg_quality_score_oracle_sql(
    rounds: int = 3,
    lr: float = 1.0,
    label_col: str = "lang",
    label_value: str = "en",
    table: str = "documents",
) -> str:
    """DuckDB twin: the same rounds unrolled as chained CTEs over the same
    rational sigmoid and det_round-ed mean gradients."""

    from kda_flink_demo_spark.operators.llm.text import (
        LANG_STOPWORDS,
        _stopword_count_sql,
    )

    k = len(_FEATS)

    def p(w: str) -> str:
        z = " + ".join(f"{w}.w{i} * f.{c}" for i, c in enumerate(_FEATS))
        return f"(0.5 + ({z}) / (2.0 * (1.0 + abs({z}))))"

    sw = _stopword_count_sql(LANG_STOPWORDS["en"], "coalesce(text, '')")
    parts = [
        f"""
    WITH f AS (
        SELECT doc_id,
               CASE WHEN {label_col} = '{label_value}' THEN 1.0 ELSE 0.0 END AS y,
               1.0 AS b,
               coalesce(n_chars, 0) / 1000.0 AS x1,
               len(string_split(coalesce(text, ''), ' ')) / 100.0 AS x2,
               {sw} / len(string_split(coalesce(text, ''), ' ')) AS x3
        FROM {table}
    ),
    w0r AS (SELECT {", ".join(f"0.0 AS w{i}" for i in range(k))})"""
    ]
    prev = "w0r"
    for r in range(1, rounds + 1):
        g = {c: det_round_sql(f"avg(({p('w')} - f.y) * f.{c})", 6) for c in _FEATS}
        g_cols = ", ".join(f"{g[c]} AS g_{c}" for c in _FEATS)
        w_carry = ", ".join(f"first(w.w{i}) AS w{i}" for i in range(k))
        w_upd = ", ".join(
            f"{det_round_sql(f'w{i} - {lr} * g_{c}', 6)} AS w{i}"
            for i, c in enumerate(_FEATS)
        )
        parts.append(
            f""",
    g{r} AS (SELECT {g_cols}, {w_carry} FROM f, {prev} w),
    w{r}r AS (SELECT {w_upd} FROM g{r})"""
        )
        prev = f"w{r}r"
    score = det_round_sql(p("w"), 6)
    parts.append(
        f"""
    SELECT f.doc_id, {score} AS score, {score} >= 0.5 AS predicted,
           f.y = 1.0 AS label
    FROM f, {prev} w"""
    )
    return "".join(parts)
