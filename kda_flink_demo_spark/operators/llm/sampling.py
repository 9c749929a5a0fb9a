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

from kda_flink_demo_spark.functions import det_round_sql

# 2^32 — the md5-prefix uniform lives in [0, 2^32); scaling an acceptance
# probability by a power of two is float-exact, so the integer threshold is
# bit-identical across engines.
_HASH_SPACE = 4294967296.0

# ONE oracle-side definition of the quality composite (the SQL twin of
# text.quality_columns) — shared by every oracle that scores quality, so the
# stopword list / weights can never drift between operators.
_QUALITY_EXPR_SQL = """0.4 * least(n_toks / 64.0, 1.0)
           + 0.3 * least((stop_hits / n_toks) * 4, 1.0)
           + 0.3 * (1 - least((punct / greatest(n_chars, 1)) * 10, 1.0))"""


def _quality_inner_sql(table: str, cols: str = "doc_id") -> str:
    """Inner SELECT producing (cols, n_toks, n_chars, stop_hits, punct)."""
    return rf"""
            SELECT {cols},
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(list_filter(string_split(lower(text), ' '),
                        t -> t IN ('the', 'and', 'of', 'to', 'a', 'in', 'is')))
                        AS BIGINT) AS stop_hits,
                   CAST(len(regexp_extract_all(text, '[^\w\s]')) AS BIGINT) AS punct
            FROM {table}"""


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


def source_upsample(
    df: DataFrame,
    weights_pct: dict[str, int],
    default_pct: int = 100,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "epochs",
) -> DataFrame:
    """Fractional deterministic UPsampling: repeat each document ``w`` epochs,
    where ``w`` is given per source in integer hundredths (250 → 2.5 epochs).

    Training mixes routinely repeat high-quality sources a non-integer number
    of times (e.g. Wikipedia ×2.5 while web text runs ×1) — the other half of
    mixture control that pure subsampling (``temperature_resample``) can't
    express. A doc with weight 2.5 yields 2 copies always, plus a 3rd iff its
    deterministic 32-bit md5 uniform falls below floor(0.5 · 2^32) — so exactly
    the same docs get the extra epoch on every run, engine, and partitioning.
    Weights < 100 degenerate to subsampling and 0 drops the source, giving one
    unified "fractional epochs" knob.

    Scale shape: pure map-side — a broadcast-free CASE on the source column,
    one hash per row, and a row-expanding explode bounded by ceil(max_w/100)
    copies. The 100 TB corpus is scanned once and never shuffled. Output:
    (id, source, epoch, n_copies) with epoch ∈ [0, n_copies).
    """
    space = int(_HASH_SPACE)

    def per_source(value_of) -> "F.Column":
        expr = F.lit(value_of(default_pct))
        for s, w in sorted(weights_pct.items()):
            expr = F.when(F.col(source_col) == s, F.lit(value_of(w))).otherwise(expr)
        return expr

    base = per_source(lambda w: w // 100).cast("long")
    thr = per_source(lambda w: space * (w % 100) // 100).cast("long")
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    copies = (base + (u < thr).cast("long")).alias("n_copies")
    keyed = df.select(F.col(id_col), F.col(source_col), copies)
    epochs = F.when(
        F.col("n_copies") > 0, F.sequence(F.lit(0).cast("long"), F.col("n_copies") - 1)
    ).otherwise(F.array().cast("array<long>"))
    return keyed.select(
        id_col, source_col, F.explode(epochs).alias("epoch"), "n_copies"
    )


def source_upsample_oracle_sql(
    weights_pct: dict[str, int],
    default_pct: int = 100,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "epochs",
    table: str = "documents",
) -> str:
    """DuckDB twin: the per-source base/threshold integers are computed in
    PYTHON and inlined into both engines' plans, so no SQL arithmetic can
    disagree at the acceptance boundary."""
    space = int(_HASH_SPACE)

    def case(value_of) -> str:
        whens = " ".join(
            f"WHEN '{s}' THEN {value_of(w)}" for s, w in sorted(weights_pct.items())
        )
        return f"CASE {source_col} {whens} ELSE {value_of(default_pct)} END"

    return f"""
    WITH c AS (
        SELECT {id_col}, {source_col},
               CAST({case(lambda w: w // 100)}
                    + CASE WHEN CAST(concat('0x', substring(
                                md5(concat('{seed}:', CAST({id_col} AS VARCHAR))), 1, 8))
                            AS BIGINT) < {case(lambda w: space * (w % 100) // 100)}
                       THEN 1 ELSE 0 END AS BIGINT) AS n_copies
        FROM {table}
    )
    SELECT {id_col}, {source_col}, CAST(e.epoch AS BIGINT) AS epoch, n_copies
    FROM c, LATERAL unnest(generate_series(0, n_copies - 1)) AS e(epoch)
    """


def mix_interleave(
    df: DataFrame,
    parts: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Deterministic weighted stride interleave: a single global training
    order where source ``s`` appears with long-run frequency ∝ ``parts[s]``
    and its documents are spread EVENLY through the stream (not front-loaded
    the way sorting by a per-source quota would).

    The classic virtual-time scheduler, made engine-portable with pure integer
    keys: doc ``i`` (0-based pseudo-random rank within its source) gets key
    ``(2i+1) · (L / w_s)`` with ``L = lcm(weights)`` — strides are exact
    integers, and sorting by (key, source) interleaves sources at their target
    rates. Sources missing from ``parts`` get weight 1.

    Scale shape: NO single-partition window anywhere. The per-source rank is a
    global prefix sum of ones in (source, hash, id) order minus a broadcast
    per-source offset (one row per source); the final position is a second
    prefix sum in (key, source) order. Both phases are the range-partitioned
    two-phase sum from ``packing._global_prefix_sum``. Output:
    (id, source, src_rank, interleave_pos).
    """
    import math

    from kda_flink_demo_spark.operators.llm.packing import _global_prefix_sum, grouped_rank

    lcm = math.lcm(1, *parts.values())
    hkey = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .alias("_hkey")
    )
    keyed = df.select(F.col(id_col), F.col(source_col), hkey)
    stride = F.lit(lcm)
    for s, w in sorted(parts.items()):
        stride = F.when(F.col(source_col) == s, F.lit(lcm // w)).otherwise(stride)
    ranked = (
        grouped_rank(keyed, source_col, ["_hkey", id_col], out_col="src_rank")
        .withColumn("_ikey", (F.lit(2) * F.col("src_rank") + 1) * stride.cast("long"))
        .select(id_col, source_col, "src_rank", "_ikey", F.lit(1).cast("long").alias("_one"))
    )
    final = _global_prefix_sum(ranked, ["_ikey", source_col], "_one", out_col="interleave_pos")
    return final.select(
        id_col, source_col, "src_rank", F.col("interleave_pos").cast("long").alias("interleave_pos")
    )


def mix_interleave_oracle_sql(
    parts: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix",
    table: str = "documents",
) -> str:
    """DuckDB twin: plain per-source and global row_number windows — the
    semantic spec the two-phase prefix sums equal. Strides are the same
    Python-computed integers inlined on both sides."""
    import math

    lcm = math.lcm(1, *parts.values())
    whens = " ".join(f"WHEN '{s}' THEN {lcm // w}" for s, w in sorted(parts.items()))
    stride = f"CASE {source_col} {whens} ELSE {lcm} END"
    return f"""
    WITH k AS (
        SELECT {id_col}, {source_col},
               CAST(concat('0x', substring(md5(concat('{seed}:', CAST({id_col} AS VARCHAR))), 1, 15))
                    AS BIGINT) AS hkey
        FROM {table}
    ),
    r AS (
        SELECT {id_col}, {source_col},
               CAST(row_number() OVER (PARTITION BY {source_col} ORDER BY hkey, {id_col}) - 1
                    AS BIGINT) AS src_rank
        FROM k
    )
    SELECT {id_col}, {source_col}, src_rank,
           CAST(row_number() OVER (ORDER BY (2 * src_rank + 1) * ({stride}), {source_col}) - 1
                AS BIGINT) AS interleave_pos
    FROM r
    """


def quality_top_fraction(
    df: DataFrame,
    fraction: tuple[int, int] = (1, 4),
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style per-group quality selection: keep the top ``num/den``
    fraction of documents WITHIN each group. Quality scores are not
    comparable across languages (stopword lists, token lengths differ), so a
    single global threshold over-prunes low-resource groups; calibrating the
    cut per group is the standard fix.

    Exactness: the per-group keep-count is ``k_g = ceil(n_g·num/den)`` in pure
    integer arithmetic, and membership is an order statistic (rank <  k_g on
    the det_round-ed quality, id tie-break) — no float threshold whose last
    ulp could flip a boundary doc between engines. Scale: the rank is the
    skew-proof grouped prefix-sum rank (never a per-group window sort); the
    k_g table is one broadcast row per group. Output:
    (id, group, quality, q_rank)."""
    from kda_flink_demo_spark.functions import det_round
    from kda_flink_demo_spark.operators.llm.packing import grouped_rank
    from kda_flink_demo_spark.operators.llm.text import quality_columns

    num, den = fraction
    qc = quality_columns(F.col(text_col))
    base = df.select(
        F.col(id_col), F.col(group_col), det_round(qc["quality"], 4).alias("quality")
    ).withColumn("_negq", -F.col("quality"))
    # one per-group count aggregate feeds BOTH the rank offsets (via counts=)
    # and the keep-count table — not two identical corpus scans
    counts = base.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    ranked = grouped_rank(base, group_col, ["_negq", id_col], out_col="q_rank", counts=counts)
    ks = counts.select(
        F.col(group_col).alias("_grp"),
        F.expr(f"CAST((_n * {int(num)} + {int(den) - 1}) DIV {int(den)} AS BIGINT)").alias("_k"),
    )
    return (
        ranked.join(F.broadcast(ks), F.col(group_col).eqNullSafe(F.col("_grp")))
        .filter(F.col("q_rank") < F.col("_k"))
        .select(id_col, group_col, "quality", "q_rank")
    )


def quality_top_fraction_oracle_sql(
    fraction: tuple[int, int] = (1, 4),
    group_col: str = "lang",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB twin: plain per-group row_number + count windows — the semantic
    spec the grouped prefix-sum rank equals. Same quality composite as
    ``token_budget_select_oracle_sql``."""
    num, den = fraction
    quality = det_round_sql(_QUALITY_EXPR_SQL, 4)
    return f"""
    WITH q AS (
        SELECT {id_col}, {group_col}, {quality} AS quality
        FROM ({_quality_inner_sql(table, f"{id_col}, {group_col}")}
        )
    ),
    r AS (
        SELECT {id_col}, {group_col}, quality,
               CAST(row_number() OVER (
                   PARTITION BY {group_col} ORDER BY quality DESC, {id_col}) - 1
                   AS BIGINT) AS q_rank,
               count(*) OVER (PARTITION BY {group_col}) AS n
        FROM q
    )
    SELECT {id_col}, {group_col}, quality, q_rank
    FROM r WHERE q_rank < (n * {int(num)} + {int(den) - 1}) // {int(den)}
    """


def dataset_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[int, ...] = (90, 5, 5),
    names: tuple[str, ...] = ("train", "val", "test"),
    seed: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the first 8 hex digits of
    ``md5(seed:id)`` give a uniform 32-bit integer; split boundaries are exact
    integer thresholds at the cumulative weights (computed in Python — no
    float division can disagree between engines). Map-only: no shuffle, no
    state, reproducible at any parallelism — the property that matters when
    the split must stay stable across recomputations of a 100 TB corpus."""
    if len(weights) != len(names) or len(names) < 2:
        raise ValueError("weights and names must align, with >= 2 buckets")
    total = sum(weights)
    bounds = []
    acc = 0
    for wgt in weights[:-1]:
        acc += wgt
        bounds.append(_HASH_SPACE * acc // total)
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    expr = F.lit(names[-1])
    for b, name in zip(reversed(bounds), reversed(names[:-1])):
        expr = F.when(u < F.lit(b), F.lit(name)).otherwise(expr)
    return df.select(F.col(id_col), expr.alias("split"))


def dataset_split_oracle_sql(
    weights: tuple[int, ...] = (90, 5, 5),
    names: tuple[str, ...] = ("train", "val", "test"),
    seed: str = "split",
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    total = sum(weights)
    bounds = []
    acc = 0
    for wgt in weights[:-1]:
        acc += wgt
        bounds.append(_HASH_SPACE * acc // total)
    u = (
        f"CAST(concat('0x', substring(md5(concat('{seed}:', CAST({id_col} AS VARCHAR))), 1, 8)) "
        "AS BIGINT)"
    )
    case = "CASE " + " ".join(
        f"WHEN {u} < {b} THEN '{n}'" for b, n in zip(bounds, names[:-1])
    ) + f" ELSE '{names[-1]}' END"
    return f"SELECT {id_col}, {case} AS split FROM {table}"


def domain_cap(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 10,
    seed: str = "42",
) -> DataFrame:
    """Keep at most ``cap`` documents per source/domain, chosen in a
    deterministic pseudo-random order (md5 of the id, seeded) — the domain
    quota of C4/RefinedWeb-style pipelines that stops any one site from
    dominating the mix.

    Skew-proof top-k per key: a straight row_number over ``source`` would drag
    every row of a hot domain into one task. Instead rank twice — first within
    each (input partition, source) slice and keep ≤ ``cap`` (bounds any group
    to cap · P rows), then rank the survivors globally per source. Both ranks
    order by the same (hash, id) key, so the final ranking equals the
    single-pass one exactly; the second window runs on ≤ cap · P rows per
    source, never the raw domain.
    """
    from pyspark.sql import Window

    hkey = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .alias("_hkey")
    )
    keyed = df.select(F.col(id_col), F.col(source_col), hkey)
    w_local = Window.partitionBy(F.spark_partition_id(), source_col).orderBy(
        "_hkey", id_col
    )
    pruned = keyed.withColumn("_lrn", F.row_number().over(w_local)).filter(
        F.col("_lrn") <= cap
    )
    w_global = Window.partitionBy(source_col).orderBy("_hkey", id_col)
    return (
        pruned.withColumn("cap_rank", F.row_number().over(w_global).cast("long"))
        .filter(F.col("cap_rank") <= cap)
        .select(id_col, source_col, "cap_rank")
    )


def domain_cap_oracle_sql(
    cap: int = 10, source_col: str = "source", seed: str = "42", table: str = "documents"
) -> str:
    """DuckDB twin: the plain single-window spec the two-phase plan equals."""
    return f"""
    WITH k AS (
        SELECT doc_id, {source_col},
               CAST(concat('0x', substring(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS hkey
        FROM {table}
    ),
    r AS (
        SELECT doc_id, {source_col},
               CAST(row_number() OVER (PARTITION BY {source_col} ORDER BY hkey, doc_id)
                    AS BIGINT) AS cap_rank
        FROM k
    )
    SELECT doc_id, {source_col}, cap_rank FROM r WHERE cap_rank <= {cap}
    """


def token_budget_select(
    df: DataFrame,
    budget: int = 16384,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-greedy corpus selection under a global token budget: order docs
    by (quality DESC, id), lay them out on the token line with a distributed
    prefix sum, and keep every doc whose interval fits entirely inside
    ``budget`` tokens. (Interval semantics — a doc that overflows is skipped
    but its slot is NOT reused; the layout is the greedy order's, so the
    result is deterministic and engine-independent.)

    Scale shape: reuses ``_global_prefix_sum`` — range partition on the order
    key, per-partition windows, a P-row offsets cumsum; never a
    single-partition window. Quality is the det_round-ed composite from
    ``quality_columns``, so the ordering key is bit-identical across engines.
    """
    from kda_flink_demo_spark.functions import det_round
    from kda_flink_demo_spark.operators.llm.packing import _global_prefix_sum
    from kda_flink_demo_spark.operators.llm.text import quality_columns

    qc = quality_columns(F.col(text_col))
    base = df.select(
        F.col(id_col),
        qc["n_tokens"].alias("n_tokens"),
        det_round(qc["quality"], 4).alias("quality"),
    ).withColumn("_negq", -F.col("quality"))
    laid = _global_prefix_sum(base, ["_negq", id_col], "n_tokens", "_start")
    return (
        laid.filter(F.col("_start") + F.col("n_tokens") <= budget)
        .select(
            id_col,
            "n_tokens",
            "quality",
            (F.col("_start") + F.col("n_tokens")).cast("long").alias("cum_tokens"),
        )
    )


def token_budget_select_oracle_sql(budget: int = 16384, table: str = "documents") -> str:
    """DuckDB twin: single ordered window sum (the semantic spec the
    distributed prefix sum equals)."""
    quality = det_round_sql(_QUALITY_EXPR_SQL, 4)
    return f"""
    WITH q AS (
        SELECT doc_id, n_toks AS n_tokens, {quality} AS quality
        FROM ({_quality_inner_sql(table)}
        )
    ),
    s AS (
        SELECT doc_id, n_tokens, quality,
               CAST(coalesce(sum(n_tokens) OVER (
                   ORDER BY quality DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS start
        FROM q
    )
    SELECT doc_id, n_tokens, quality,
           CAST(start + n_tokens AS BIGINT) AS cum_tokens
    FROM s WHERE start + n_tokens <= {budget}
    """
