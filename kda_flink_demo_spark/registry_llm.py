"""LLM-pipeline query registrations (dedup / similarity / text / multimodal) —
imported by ``registry`` so the decorators run at import time."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from kda_flink_demo_spark.io.sources import load_table
from kda_flink_demo_spark.operators.llm import (
    classifier,
    clustering,
    dedup,
    image_dedup,
    synth_media,
    packing as packing_mod,
    embeddings,
    kmeans,
    lm,
    multimodal,
    pipeline,
    privacy,
    sampling,
    similarity,
    text,
    versioning,
)
from kda_flink_demo_spark.operators.llm.standing import standing_artifact, standing_put
from kda_flink_demo_spark.registry import register


def _lsh_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The session's standing LSH pair graph over the documents table
    (threshold 0.8) — built once per session, consumed by the clusters and
    apply-dedup stages (a production dedup pipeline materializes the pair
    graph once and feeds every downstream stage from it)."""
    return standing_artifact(
        spark,
        ("lsh_pairs", sf_dir, 0.8),
        lambda: dedup.minhash_lsh_pairs(
            load_table(spark, sf_dir, "documents"), threshold=0.8
        ).localCheckpoint(),
    )


_NGRAM_ORACLE = """
    WITH sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY 1),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, floor(shared / (ca.c + cb.c - shared) * 10000.0 + 0.5) / 10000.0 AS jaccard
    FROM pairs JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
    WHERE shared / (ca.c + cb.c - shared) >= {threshold}
"""


@register(
    "dedup_exact",
    "SELECT min(doc_id) AS doc_id, count(*) AS dup_count FROM documents GROUP BY text",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: survivor id + duplicate count per identical text (hash-groupBy;
    scale path shuffles an 8-byte xxhash64 key instead of full text)."""
    return dedup.exact_dedup_stats(load_table(spark, sf_dir, "documents"))


@register("dedup_editdist_pairs", dedup.editdist_pairs_oracle_sql())
def q_dedup_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical pairs by exact EDIT DISTANCE with normalized-prefix
    blocking — the record-linkage complement to shingle dedup (catches small
    in-place edits Jaccard under-weights; levenshtein runs JVM-side). The
    oracle recomputes blocking + distances in DuckDB, so the engines' two
    independent levenshtein kernels must agree on every pair."""
    return dedup.editdist_pairs(load_table(spark, sf_dir, "documents"))


def _build_editdist_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 != 1)
    return dedup.build_editdist_ingest_index(corpus)


def _editdist_index_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    return standing_artifact(
        spark, ("editdist_index", sf_dir), lambda: _build_editdist_index(spark, sf_dir)
    )


@register(
    "editdist_ingest_index_build",
    """
    SELECT substr(lower(text), 1, 32) AS pfx,
           CAST(count(DISTINCT text) AS BIGINT) AS n_texts
    FROM documents WHERE NOT (doc_id % 3 = 1) AND text IS NOT NULL
    GROUP BY 1
    """,
)
def q_editdist_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standing edit-distance ingest index BUILD (r12 verdict directive
    2 — the fuzzy_ingest_index_build convention): one corpus collapse to
    DISTINCT texts + (prefix, length-bucket) block keys, always rebuilt
    fresh so its benched time is the honest index-construction cost split
    out from the per-batch probe, refreshing the session's standing artifact
    that ingest_dedup_editdist consumes. Output is the index's COVERAGE
    contract, oracle-pinned: every non-null corpus text appears exactly
    once, grouped per prefix."""
    idx = standing_put(
        spark, ("editdist_index", sf_dir), _build_editdist_index(spark, sf_dir)
    )
    return idx.groupBy(F.col("_cpfx").alias("pfx")).agg(
        F.count(F.lit(1)).cast("long").alias("n_texts")
    )


@register("ingest_dedup_editdist", dedup.ingest_editdist_gate_oracle_sql())
def q_ingest_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The edit-distance INGEST gate, driver-checkable with the image/audio
    gates' split: incoming batch = docs ≡ 1 mod 3, standing corpus = the
    rest; an incoming doc survives iff its text is not near-identical
    (levenshtein ≤ 20, exact dups included) to any corpus doc or any
    earlier incoming doc. Probes the session's STANDING corpus index (built
    by editdist_ingest_index_build or on first use — r13 split: the benched
    recurring cost is the per-batch probe, not a corpus re-collapse); the
    batch's (prefix, length-bucket±1) keys broadcast-probe the index scan
    (the index never shuffles; only same-block rows pay the bounded
    levenshtein verify); the oracle recomputes every drop rule in DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    survivors = dedup.ingest_editdist_gate(
        docs.filter(F.col("doc_id") % 3 == 1),
        corpus_index=_editdist_index_cached(spark, sf_dir),
    )
    return survivors.select("doc_id", "n_chars")


@register("editdist_block_skew_report", dedup.editdist_block_stats_oracle_sql())
def q_editdist_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew visibility for the editdist blocking (r12 verdict directive 1):
    one oracle-checked row of block-size stats over the (prefix, length
    bucket) key, including how many candidate texts the deterministic
    per-block cap would drop — the 'log-reported dropped count' surfaced
    first-class so a monoculture corpus shows up as dropped_texts > 0
    instead of a silent quadratic block."""
    return dedup.editdist_block_stats(load_table(spark, sf_dir, "documents"))


@register("dedup_ngram_jaccard", _NGRAM_ORACLE.format(threshold=0.5))
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard near-dup pairs (threshold 0.5) via shingle
    inverted-index self-join — the oracle baseline for MinHash/SimHash."""
    return dedup.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), threshold=0.5)


@register("dedup_minhash_lsh", _NGRAM_ORACLE.format(threshold=0.8))
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (64 hashes) + LSH banding (16×4) near-dup pairs at threshold 0.8,
    exact-Jaccard re-verified. Oracle is the exact pairwise computation: with
    these parameters P(miss | j≥0.8) ≤ 4e-4 per pair, so results coincide.

    This is the pair graph's BUILD query: it always rebuilds fresh (its
    benched time is the honest construction cost) and refreshes the session's
    standing pair-graph artifact, which the clusters/apply-dedup stages
    consume (see ``_lsh_pairs_cached``)."""
    pairs = dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.8
    ).localCheckpoint()
    return standing_put(spark, ("lsh_pairs", sf_dir, 0.8), pairs)


@register("dedup_simhash", None, helper=True)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3, 16-bit-quarter blocking), all
    JVM-side. Token hash is Spark's xxhash64 (not available in DuckDB) → no SQL
    oracle; validated against ngram-Jaccard pairs in tests, and externally
    evidenced by the hash-checkable dedup_simhash_report companion. Registered
    as a HELPER (benched/plan-dumped, not a driver queries() row) per the r07
    verdict: the companion is the external check surface."""
    return dedup.simhash_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_report",
    "SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs, TRUE AS recall_ok FROM ("
    + _NGRAM_ORACLE.format(threshold=0.8)
    + ") t",
)
def q_dedup_simhash_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable companion to dedup_simhash (the recall-report template):
    the exact Jaccard ≥ 0.8 pair-graph size (oracle-verified exactly) plus a
    pinned boolean asserting SimHash candidates at hamming ≤ 6 recall ≥ 0.8 of
    it — integer arithmetic on a deterministic candidate set, so the boolean
    cannot flap (measured floors 0.93/0.92/0.88 across the three SFs).
    Verification query, not the scale path — it deliberately pays the exact
    pair graph, like its oracle."""
    return dedup.simhash_recall_report(
        load_table(spark, sf_dir, "documents"),
        threshold=0.8,
        max_hamming=6,
        recall_tenths=8,
    )


_TOPK_ORACLE = """
    WITH n AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id IN (0, 1, 2, 3, 4)),
    pairs AS (
        SELECT q.query_id, n.vec_id AS neighbor_id,
               floor(list_dot_product(q.qv, n.v) / (q.qn * n.nrm) * 1000000.0 + 0.5) / 1000000.0 AS cosine
        FROM q JOIN n ON n.vec_id != q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank"
        FROM pairs
    )
    SELECT query_id, neighbor_id, cosine, "rank" FROM ranked WHERE "rank" <= 5
"""


@register("similarity_topk", _TOPK_ORACLE)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors 0–4: broadcast queries × full
    scan, JVM-side fold dot products, deterministic tie-break."""
    return similarity.cosine_topk(
        load_table(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=5
    )


# Brute-force top-5 evidence per query (CSV of neighbor ids in rank order,
# rounded cosine sum, row count) — all exactly SQL-derivable — plus the pinned
# recall boolean the Spark side computes from the seeded-deterministic ANN
# branch (integer arithmetic: hits·10 ≥ 6·brute_cnt, measured floor across
# sf0.001/0.01/0.1 in round 7).
_ANN_RECALL_ORACLE = """
    WITH n AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id IN (0, 1, 2, 3, 4)),
    pairs AS (
        SELECT q.query_id, n.vec_id AS neighbor_id,
               floor(list_dot_product(q.qv, n.v) / (q.qn * n.nrm) * 1000000.0 + 0.5) / 1000000.0 AS cosine
        FROM q JOIN n ON n.vec_id != q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank"
        FROM pairs
    )
    SELECT query_id,
           string_agg(neighbor_id::VARCHAR, ',' ORDER BY "rank") AS brute_neighbors,
           floor(sum(cosine) * 1000000.0 + 0.5) / 1000000.0 AS brute_cos_sum,
           count(*) AS brute_cnt,
           TRUE AS recall_ok
    FROM ranked WHERE "rank" <= 5 GROUP BY 1
"""


@register("similarity_ann_lsh", _ANN_RECALL_ORACLE)
def q_similarity_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH buckets (8 tables × 4
    planes, multi-probe nprobe=3) + exact cosine re-rank, made hash-checkable
    (the sketch_incremental_pack template): each row carries the brute-force
    top-5 evidence the oracle verifies exactly, plus the pinned
    recall@5 ≥ 0.6 boolean computed from the seeded-deterministic LSH branch
    (integer comparison — cannot flap). Measured per-query recall floor at
    nprobe=3 is exactly 0.6 (sf0.001) and ≥0.8 at sf0.01."""
    return similarity.ann_recall_report(
        load_table(spark, sf_dir, "embeddings"),
        query_ids=[0, 1, 2, 3, 4],
        k=5,
        method="lsh",
        recall_tenths=6,
        nprobe=3,
    )


@register(
    "dedup_embedding_cosine",
    """
    WITH n AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    )
    SELECT vec_a, vec_b, cosine FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               floor(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) * 1000000.0 + 0.5)
                   / 1000000.0 AS cosine
        FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE a.nrm > 0 AND b.nrm > 0
    ) WHERE cosine >= 0.35
    """,
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label (the standard scale
    pattern: an equality blocking key — cluster id, LSH bucket, shard — bounds
    the pairwise comparison to within-block; here the provided label column).
    Exact cosine within blocks; both sides threshold the det_round(6)-ed
    cosine, so a pair sitting within float-fold noise of the cut cannot flip
    between engines; zero-norm vectors never match."""
    return similarity.embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), block_col="label", threshold=0.35
    )


# Shared recursive-CTE prefix: exact Jaccard ≥ 0.8 pair graph → transitive
# closure → per-component canonical id + size. Used by the clusters oracle and
# the apply-dedup (surviving corpus) oracle.
_CLUSTERS_CTE = """
    WITH RECURSIVE
    sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY 1),
    rawp AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    jpairs AS (
        SELECT doc_a, doc_b
        FROM rawp JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
        WHERE shared / (ca.c + cb.c - shared) >= 0.8
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM jpairs
        UNION SELECT doc_b, doc_a FROM jpairs
    ),
    reach(u, r) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
    ),
    comp AS (SELECT u, min(r) AS canonical_id FROM reach GROUP BY u),
    sizes AS (SELECT canonical_id, count(*) AS cluster_size FROM comp GROUP BY 1)
"""

_CLUSTERS_ORACLE = (
    _CLUSTERS_CTE
    + """
    SELECT comp.u AS doc_id, comp.canonical_id, sizes.cluster_size
    FROM comp JOIN sizes USING (canonical_id)
"""
)


@register("dedup_clusters", _CLUSTERS_ORACLE)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS (not just pairs): connected components over the
    Jaccard ≥ 0.8 pair graph via iterative min-label propagation — the
    'iterative algorithm' capability class. The pair graph comes from the
    MinHash+LSH scale path (exact-verified candidates; equals the exact
    pairwise graph at this threshold — asserted in tests — so the whole
    pipeline is the one you'd run at 100 TB). Oracle: DuckDB recursive CTE
    transitive closure over the exact pair graph. Consumes the session's
    standing pair graph (built by dedup_minhash_lsh or on first use) — in
    production the pair graph is materialized once and every downstream
    stage reads it; this query's cost is the CC iteration itself."""
    from kda_flink_demo_spark.operators.llm import clustering

    docs = load_table(spark, sf_dir, "documents")
    return clustering.dedup_clusters(docs, _lsh_pairs_cached(spark, sf_dir))


@register("similarity_ivf_topk", _ANN_RECALL_ORACLE)
def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (per-label centroid inverted lists, exact re-rank), made
    hash-checkable like similarity_ann_lsh: brute-force top-5 evidence
    (oracle-verified exactly) + pinned recall@5 ≥ 0.6 boolean from the
    deterministic IVF branch. The fixture has only 10 label lists, so hitting
    that recall takes nprobe=8 — at production scale the lists are k-means
    centroids with n_lists ≈ √N and nprobe stays ≪ n_lists; the plumbing
    (centroid table broadcast twice, corpus never shuffles) is the part that
    carries to 100 TB. Measured per-query recall floor at nprobe=8: exactly
    0.6 at sf0.001/sf0.01, 0.8 at sf0.1."""
    return similarity.ann_recall_report(
        load_table(spark, sf_dir, "embeddings"),
        query_ids=[0, 1, 2, 3, 4],
        k=5,
        method="ivf",
        recall_tenths=6,
        nprobe=8,
    )


@register("text_tfidf_top_terms", text.TFIDF_ORACLE_SQL)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document: explode → tf/df aggregations → broadcast
    df table → rounded-score ranking."""
    return text.tfidf_top_terms(load_table(spark, sf_dir, "documents"))


@register("text_language_id", text.language_id_oracle_sql())
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID with per-language scores and deterministic
    argmax tie-break."""
    return text.language_id(load_table(spark, sf_dir, "documents"))


@register("text_quality", text.QUALITY_ORACLE_SQL)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-style quality scoring: token/char stats, stopword and
    punctuation ratios, composite score."""
    return text.quality_score(load_table(spark, sf_dir, "documents"))


@register(
    "text_token_stats",
    r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '\w+|[^\w\s]')) AS re_tokens,
           length(text) AS char_len
    FROM documents
    """,
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens + char length."""
    return text.token_stats(load_table(spark, sf_dir, "documents"))


@register("doc_fingerprint", text.FINGERPRINT_ORACLE_SQL)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full-text polynomial rolling hash + winnowing-style
    min over word-5-gram hashes."""
    return text.doc_fingerprint(load_table(spark, sf_dir, "documents"))


@register("multimodal_decode", multimodal.DECODE_ORACLE_SQL)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload image decode plumbing via mapInPandas (deterministic stub
    decode — see operators/llm/multimodal.py; plumbing is real and oracle-tested
    on the fake's arithmetic)."""
    docs = multimodal.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return multimodal.decode_image_features(docs)


@register("multimodal_audio_decode", multimodal.AUDIO_ORACLE_SQL)
def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-decode plumbing via mapInPandas (deterministic stub: sample rate /
    duration / RMS from the raw bytes; real decode gated on librosa)."""
    docs = multimodal.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return multimodal.decode_audio_features(docs)


@register("multimodal_resize", multimodal.RESIZE_ORACLE_SQL)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage on the opaque payload column: stub geometry is pure
    integer byte math (all-JVM narrow projection — no Python in the stub
    path), "resized" bytes are the integer-proportional prefix, output
    carries md5(prefix) so the result is verifiable without binary-column
    hashing; real PIL resize behind real_decode=True (same mapInPandas shape
    as decode)."""
    docs = multimodal.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return multimodal.resize_images(docs)


@register("multimodal_frame_sample", multimodal.FRAME_ORACLE_SQL)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding mapInPandas frame sampling over binary payloads (every 5th
    fake frame with a per-frame score)."""
    docs = multimodal.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return multimodal.sample_video_frames(docs)


@register(
    "text_normalize",
    text.NORMALIZE_ORACLE_SQL,
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus text normalization: NFC + lowercase + whitespace collapse + trim,
    with change flag and normalized codepoint count."""
    return text.normalize_text(load_table(spark, sf_dir, "documents"))


@register(
    "contamination_check",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 3),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))) AS shingle
           FROM w),
    tr AS (SELECT * FROM sh WHERE doc_id % 10 <> 0),
    ev AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
    cnt AS (SELECT doc_id, count(*) AS c FROM tr GROUP BY 1),
    shared AS (SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id, count(*) AS shared_shingles
               FROM tr JOIN ev ON tr.shingle = ev.shingle GROUP BY 1, 2)
    SELECT train_id, eval_id, shared_shingles,
           floor(shared_shingles / c * 10000.0 + 0.5) / 10000.0 AS containment
    FROM shared JOIN cnt ON train_id = cnt.doc_id
    WHERE shared_shingles / c >= 0.3
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: word-5-gram containment of each training doc
    (doc_id % 10 != 0) against the eval split (doc_id % 10 == 0); the eval
    shingle index is broadcast so the corpus side never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import functions as F

    return dedup.contamination_pairs(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        n=5,
        min_containment=0.3,
    )


@register(
    "pack_sequences",
    """
    WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
               FROM documents),
    s AS (SELECT doc_id, n_tokens,
                 coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
          FROM t)
    SELECT doc_id, n_tokens,
           CAST(start // 2048 AS BIGINT) AS chunk_id,
           CAST(start % 2048 AS BIGINT) AS chunk_offset FROM s
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sample packing: global token prefix-sum → (chunk_id,
    chunk_offset) per document at a 2048-token budget, computed with the
    two-phase distributed prefix sum (range partition → local cumsum →
    broadcast partition offsets), never a single global sort."""
    from kda_flink_demo_spark.operators.llm import packing

    return packing.pack_sequences(load_table(spark, sf_dir, "documents"), budget=2048)


# Deterministic synthetic-PII injection (the corpus is PII-free word soup, so
# both engines append the same constructed identifiers — the operator is then
# measured on real matches, not on an empty corpus).
_PII_DOC_EXPR = """
    (SELECT doc_id,
            text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 || CASE WHEN doc_id % 3 = 0
                         THEN ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                         ELSE '' END
                 || CASE WHEN doc_id % 4 = 0
                         THEN ' call 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                         ELSE '' END AS text
     FROM documents) pii_docs
"""


@register("text_pii_redact", privacy.pii_redact_oracle_sql(_PII_DOC_EXPR))
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + masking (emails / phones / IPv4) with per-doc match
    counts. Narrow regex projection — scan speed at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit(" call 555-010-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return privacy.pii_redact(injected)


@register("text_repetition", privacy.REPETITION_ORACLE_SQL)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics (dup-word / top-word / top-bigram
    fractions) via the distributed explode → groupBy shape."""
    return privacy.repetition_metrics(load_table(spark, sf_dir, "documents"))


@register(
    "url_domain_stats",
    """
    SELECT regexp_extract(url, 'https?://([^/]+)', 1) AS domain,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           floor(avg(n_chars) * 10000.0 + 0.5) / 10000.0 AS avg_chars
    FROM (SELECT 'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR) AS url,
                 n_chars
          FROM documents)
    GROUP BY 1
    """,
)
def q_url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus rollup: host extracted with Spark's ``parse_url``
    built-in from a URL synthesized off the ``source`` column (the corpus has
    no URL column; both engines build the same one)."""
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        "n_chars",
    )
    return privacy.url_domain_stats(urls)


@register("embedding_quantize", embeddings.QUANTIZE_ORACLE_SQL)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column (FAISS
    SQ8-style): per-vector scale, reconstruction MSE, first-8 codes. Narrow
    JVM-side array projection — scan speed at any scale."""
    return embeddings.quantize_embeddings(load_table(spark, sf_dir, "embeddings"))


@register(
    "dedup_apply_fuzzy",
    _CLUSTERS_CTE
    + """
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d
    WHERE NOT EXISTS (
        SELECT 1 FROM comp WHERE comp.u = d.doc_id AND comp.u <> comp.canonical_id
    )
    """,
)
def q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end fuzzy dedup OUTPUT: the surviving corpus after MinHash+LSH →
    exact verify → connected components → drop non-canonical members. The
    whole pipeline a training run would execute; one anti join over the
    corpus. Oracle: recursive-CTE transitive closure over the exact pair
    graph, then NOT EXISTS against the drop-list. Consumes the session's
    standing pair graph (like dedup_clusters) — its benched cost is the CC
    iteration + the corpus anti join, the downstream-stage cost."""
    from kda_flink_demo_spark.operators.llm import clustering

    docs = load_table(spark, sf_dir, "documents")
    clusters = clustering.dedup_clusters(docs, _lsh_pairs_cached(spark, sf_dir))
    return clustering.apply_dedup(docs, clusters)


@register("chunk_documents", text.chunk_documents_oracle_sql(size=64, stride=48))
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG / context-window chunking: 64-token chunks every 48 tokens (16-token
    overlap), final chunk short, none wholly contained in another. Narrow
    row-expanding map — no shuffle at any scale."""
    return text.chunk_documents(load_table(spark, sf_dir, "documents"), size=64, stride=48)


@register(
    "corpus_shuffle_order",
    """
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY hkey, doc_id) - 1 AS BIGINT) AS shuffle_pos
    FROM (
        SELECT doc_id,
               CAST(concat('0x', substring(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS hkey
        FROM documents
    )
    """,
)
def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training order: md5-keyed pseudo-random permutation
    with positions from the two-phase distributed prefix sum (range partition
    on the hash key — never a single-partition row_number window). The oracle's
    row_number is the semantic spec; the engine computes the same order
    scalably."""
    from kda_flink_demo_spark.operators.llm import packing

    return packing.global_shuffle_order(load_table(spark, sf_dir, "documents"))


@register("dedup_span_stats", dedup.duplicate_spans_oracle_sql(span=10, min_docs=2))
def q_dedup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication stats (Lee et al. 2021): per document, how
    many of its distinct 10-token spans occur in ≥2 documents corpus-wide. One
    shuffle on the (hashed) span key, one per-doc grouped count."""
    return dedup.duplicate_spans(load_table(spark, sf_dir, "documents"), span=10, min_docs=2)


@register("span_dedup_apply", dedup.span_dedup_apply_oracle_sql(span=10))
def q_span_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup APPLIED (the removal dedup_span_stats only
    reports): every 10-token span already present in a smaller-id document is
    cut from later documents' text; returns the cleaned corpus with per-doc
    removal counts. One hashed-span shuffle + a contaminated-only start-list
    aggregate; the earliest copy of a boilerplate paragraph survives, later
    verbatim copies are removed without dropping their documents."""
    return dedup.span_dedup_apply(load_table(spark, sf_dir, "documents"), span=10)


@register("span_decontaminate", dedup.span_decontaminate_oracle_sql(span=10))
def q_span_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level benchmark decontamination: every 10-token window appearing
    verbatim in the eval split (doc_id % 10 == 0, the contamination_check
    convention) is cut from the training docs' text — the removal complement
    of contamination_check's doc-level report. Eval reduces to a broadcast
    hashed-span index; the corpus never shuffles for detection."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.span_decontaminate(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        span=10,
    )


@register("length_buckets", text.length_buckets_oracle_sql())
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two token-length histogram (packing/batch-shape planning input);
    bucket index on the integer bit-length path, never float log2."""
    return text.length_buckets(load_table(spark, sf_dir, "documents"))


@register(
    "temperature_resample",
    sampling.temperature_resample_oracle_sql(alpha=0.5, source_col="lang"),
)
def q_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-temperature resampling (surviving counts ∝ n_src^0.5):
    per-source acceptance thresholds broadcast onto a map-side md5 filter — the
    corpus never shuffles. Grouped on `lang` (the fixture's skewed grouping,
    64–218 docs at sf0.01; `source` is uniform so thinning would never fire)."""
    return sampling.temperature_resample(
        load_table(spark, sf_dir, "documents"), source_col="lang", alpha=0.5
    )


@register("vocab_top_terms", text.vocab_top_terms_oracle_sql(k=500))
def q_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary (tokenizer-training precursor): top-500 terms by
    global count + doc frequency — one partial→final term aggregate, top-k via
    TakeOrderedAndProject, rank window over the k survivors only."""
    return text.vocab_top_terms(load_table(spark, sf_dir, "documents"), k=500)


@register("inverted_index", text.inverted_index_oracle_sql(postings_cap=20, min_df=2))
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-side posting lists (search infra for a training-data
    pipeline): per term with df ≥ 2, doc frequency + total count + the first
    20 doc ids CSV. The rank filter precedes collect_list, so posting-list
    aggregate state is bounded by the cap regardless of stopword df — the
    100 TB-safety property; the window and final aggregate share one term
    exchange."""
    return text.inverted_index(
        load_table(spark, sf_dir, "documents"), postings_cap=20, min_df=2
    )


_UPSAMPLE_WEIGHTS = {"src0": 250, "src1": 130, "src2": 60, "src3": 0}
_MIX_PARTS = {"en": 4, "zh": 3, "es": 2}


@register(
    "source_upsample",
    sampling.source_upsample_oracle_sql(_UPSAMPLE_WEIGHTS),
)
def q_source_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional deterministic upsampling (epochs per source in hundredths):
    src0 ×2.5, src1 ×1.3, src2 ×0.6 (subsample), src3 dropped, rest ×1 — the
    upsampling half of mixture control that temperature_resample (subsample-
    only) can't express. Map-side CASE + md5 acceptance + bounded explode."""
    return sampling.source_upsample(
        load_table(spark, sf_dir, "documents"), _UPSAMPLE_WEIGHTS
    )


@register(
    "mix_interleave",
    sampling.mix_interleave_oracle_sql(_MIX_PARTS, source_col="lang"),
)
def q_mix_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted stride interleave into a single training order
    (en:zh:es:rest = 4:3:2:1 rates, evenly spread, reproducible at any
    parallelism) — two two-phase prefix sums, no single-partition window.
    Grouped on `lang` (the fixture's skewed grouping)."""
    return sampling.mix_interleave(
        load_table(spark, sf_dir, "documents"), _MIX_PARTS, source_col="lang"
    )


@register(
    "quality_top_fraction",
    sampling.quality_top_fraction_oracle_sql(fraction=(1, 4)),
)
def q_quality_top_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language quality selection: keep the top 25% of docs
    WITHIN each lang (per-group order statistic, integer keep-counts — no
    float threshold at the boundary; skew-proof grouped prefix-sum rank)."""
    return sampling.quality_top_fraction(
        load_table(spark, sf_dir, "documents"), fraction=(1, 4)
    )


@register("corpus_filter_pipeline", pipeline.filter_pipeline_oracle_sql())
def q_corpus_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed corpus filter: length gate → exact-substring duplication gate →
    quality gate, labelling every doc `kept` or its first failing filter."""
    return pipeline.filter_pipeline(load_table(spark, sf_dir, "documents"))


@register("lm_bigram_score", lm.bigram_lm_score_oracle_sql())
def q_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM scoring (CCNet/KenLM-shaped perplexity filter):
    per-doc average negative log-likelihood under corpus-wide bigram MLE.
    Vocabulary-bounded count tables, position stream joined against them."""
    return lm.bigram_lm_score(load_table(spark, sf_dir, "documents"))


@register("domain_cap", sampling.domain_cap_oracle_sql(cap=10))
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style domain quota: keep ≤10 docs per source in a seeded
    deterministic hash order — two-phase skew-proof top-k per key."""
    return sampling.domain_cap(load_table(spark, sf_dir, "documents"), cap=10)


@register("token_budget_select", sampling.token_budget_select_oracle_sql(budget=16384))
def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-greedy corpus selection under a 16384-token global budget via
    the two-phase distributed prefix sum (never a single-partition window)."""
    return sampling.token_budget_select(load_table(spark, sf_dir, "documents"), budget=16384)


@register(
    "ingest_dedup",
    """
    WITH corpus AS (SELECT text FROM documents WHERE doc_id < 400),
    incoming AS (
        SELECT doc_id, text FROM documents WHERE doc_id >= 400
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 50
    )
    SELECT i.doc_id FROM incoming i
    WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = i.text)
    """,
)
def q_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest exact dedup: an incoming batch (new docs + re-crawled
    duplicates of corpus docs, simulated by re-keying doc_id<50) anti-joined on
    hashed text against the standing corpus. Stream-static capable — the
    streaming twin is batch-as-oracle tested."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    recrawl = docs.filter(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10000)
    )
    incoming = docs.filter(F.col("doc_id") >= 400).unionByName(recrawl)
    return dedup.ingest_dedup_against_corpus(incoming, corpus).select("doc_id")


@register(
    "dedup_keep_best",
    """
    SELECT doc_id, n_chars, dup_count FROM (
        SELECT doc_id, n_chars,
               count(*) OVER (PARTITION BY text) AS dup_count,
               row_number() OVER (PARTITION BY text ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping each duplicate group's highest-quality member
    (longest text, ties to smallest id) — the keep-best variant of
    dedup_exact; one 8-byte xxhash64 shuffle, rank + group count in one
    window pass."""
    return dedup.exact_dedup_keep_best(load_table(spark, sf_dir, "documents"))


@register("dataset_split", sampling.dataset_split_oracle_sql())
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment via integer md5
    thresholds — map-only, reproducible at any parallelism and across
    recomputations of the corpus."""
    return sampling.dataset_split(load_table(spark, sf_dir, "documents"))


@register("embedding_kmeans", kmeans.kmeans_oracle_sql(k=10, iters=3))
def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (k=10, 3 assignment rounds) over the
    embeddings table: deterministic md5-ordered seeding, broadcast-centroid
    assignment on rounded dot-product distances, posexplode+avg centroid
    update. Iterative-algorithm category alongside connected components — the
    oracle unrolls the same three rounds as DuckDB CTEs."""
    return kmeans.kmeans_assign(load_table(spark, sf_dir, "embeddings"), k=10, iters=3)


@register(
    "semantic_dedup",
    kmeans.semantic_dedup_oracle_sql(k=10, iters=3, threshold=0.35),
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic near-dup pairs: k-means clusters as the
    blocking key (no label needed — the unsupervised twin of
    dedup_embedding_cosine), exact chunked-BLAS cosine within clusters at the
    det_round(6)-ed threshold."""
    return kmeans.semantic_dedup_pairs(
        load_table(spark, sf_dir, "embeddings"), k=10, iters=3, threshold=0.35
    )


@register(
    "ingest_dedup_fuzzy",
    """
    WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
    incoming AS (
        SELECT doc_id, text FROM documents WHERE doc_id >= 400
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 50
    ),
    shc AS (
        SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus)
    ),
    shi AS (
        SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM incoming)
    ),
    cc AS (SELECT doc_id, count(*) AS c FROM shc GROUP BY 1),
    ic AS (SELECT doc_id, count(*) AS c FROM shi GROUP BY 1),
    shared AS (
        SELECT i.doc_id AS i_id, c.doc_id AS c_id, count(*) AS s
        FROM shi i JOIN shc c ON i.shingle = c.shingle
        GROUP BY 1, 2
    ),
    matched AS (
        SELECT DISTINCT sh.i_id FROM shared sh
        JOIN ic ON ic.doc_id = sh.i_id
        JOIN cc ON cc.doc_id = sh.c_id
        WHERE CAST(sh.s AS DOUBLE) / (ic.c + cc.c - sh.s) >= 0.8
    )
    SELECT doc_id FROM incoming
    WHERE doc_id NOT IN (SELECT i_id FROM matched)
    """,
)
def q_ingest_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest NEAR-dup dedup (the fuzzy twin of ingest_dedup):
    incoming docs — new docs plus re-keyed exact re-crawls — are LSH-probed
    against the standing corpus's band buckets; cross-side candidates are
    exactly re-verified at trigram-Jaccard ≥ 0.8, survivors come out of one
    anti join. Oracle is the exact cross-side pairwise Jaccard (LSH recall at
    these parameters is exact on this fixture — the same invariant
    test_minhash_lsh_equals_exact_at_high_threshold asserts). Probes the
    session's STANDING corpus index (built by fuzzy_ingest_index_build or on
    first use) — the production shape, where the index is materialized once
    and every ingest batch pays only the probe."""
    docs = load_table(spark, sf_dir, "documents")
    recrawl = docs.filter(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10000)
    )
    incoming = docs.filter(F.col("doc_id") >= 400).unionByName(recrawl)
    buckets, hashes = _fuzzy_index_cached(spark, sf_dir)
    return dedup.ingest_dedup_fuzzy_probe(incoming, buckets, hashes).select("doc_id")


def _build_fuzzy_index(spark: SparkSession, sf_dir: str):
    corpus = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    buckets, hashes = dedup.build_fuzzy_ingest_index(corpus)
    # materialized with exact size stats so the probe's (band, bucket) join
    # broadcasts it (see ingest_dedup_fuzzy's r04 note)
    return buckets.localCheckpoint(), hashes


def _fuzzy_index_cached(spark: SparkSession, sf_dir: str):
    return standing_artifact(
        spark, ("fuzzy_index", sf_dir), lambda: _build_fuzzy_index(spark, sf_dir)
    )


@register(
    "fuzzy_ingest_index_build",
    """
    SELECT doc_id, CAST(16 AS BIGINT) AS n_bands
    FROM documents
    WHERE doc_id < 400 AND len(string_split(text, ' ')) >= 3
    """,
)
def q_fuzzy_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standing fuzzy-ingest index BUILD (one checkpointed corpus shingle
    pass → MinHash signatures → 16 band buckets per doc): always rebuilds
    fresh — its benched time is the honest index-construction cost, split out
    from the per-batch probe (r05 VERDICT directive 3) — and refreshes the
    session's standing artifact that ingest_dedup_fuzzy probes. Output is the
    index's COVERAGE contract, which the oracle pins exactly: every corpus
    doc with ≥ 3 words (shorter docs have no trigram shingles) appears in the
    bucket table with exactly one bucket per band."""
    buckets, hashes = standing_put(
        spark, ("fuzzy_index", sf_dir), _build_fuzzy_index(spark, sf_dir)
    )
    return buckets.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bands")
    )


@register(
    "quality_logreg_score", classifier.logreg_quality_score_oracle_sql(rounds=3)
)
def q_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed supervised training: a logistic-regression language/quality
    classifier trained by 3 rounds of full-batch gradient descent (rational
    fast sigmoid — no exp, so every arithmetic op is cross-engine
    bit-identical; det_round(6)-ed mean gradients kill fold-order noise, the
    kmeans recipe) and applied to score every document. One corpus scan per
    round, 4 doubles of state, zero driver collects; the oracle unrolls the
    identical rounds as DuckDB CTEs. (The synthetic fixture's lang labels are
    content-independent — stopword ratios are ~equal across langs — so
    majority-class is Bayes-optimal HERE; the separable-fixture unit test
    proves the trainer actually learns when the data allows.)"""
    return classifier.logreg_quality_score(
        load_table(spark, sf_dir, "documents"), rounds=3
    )


@register("embedding_pca", None, helper=True)
def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA projection to the top-8 principal components: one
    corpus scan of BLAS partial outer products → dim²-bounded sufficient
    statistics → driver-side eigh on the 64×64 matrix (model fitting, not a
    data collect) → broadcast map-side projection. Eigendecomposition is not
    SQL-expressible → registered as a HELPER (benched/plan-dumped, not a
    driver queries() row; embedding_pca_check is the hash-green external
    surface, per the r07 verdict); validated against a pure-numpy
    reference on a separated-spectrum fixture in tests. Output is flattened
    to det-rounded scalar columns ``pc1..pc8`` (not ``array<double>``) so
    external row-comparators can sort and count it."""
    return embeddings.pca_project(
        load_table(spark, sf_dir, "embeddings"), k=8, scalar_cols=True
    )


@register(
    "embedding_pca_check",
    """
    WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    d AS (SELECT vec_id, unnest(range(1, len(v) + 1)) AS pos, unnest(v) AS x FROM n),
    mu AS (SELECT pos, avg(x) AS m FROM d GROUP BY 1),
    cn AS (
        SELECT vec_id, sum((x - m) * (x - m)) AS cn2
        FROM d JOIN mu USING (pos) GROUP BY 1
    )
    SELECT vec_id,
           floor(cn2 * 1000000.0 + 0.5) / 1000000.0 AS centered_norm2,
           TRUE AS bessel_ok,
           TRUE AS var_explained_ok
    FROM cn
    """,
)
def q_embedding_pca_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable companion to embedding_pca (eigh is not
    SQL-expressible, but its defining properties are): per vector the
    det-rounded ‖v−μ‖² the oracle computes exactly, a pinned Bessel boolean
    (an orthogonal projection never grows a norm — trips on any
    orthonormality bug), and a pinned global variance-explained ≥ 0.1
    boolean (measured 0.20/0.20/0.16 across the three SFs for k=8). One
    shared dim²-bounded fit + one map-side norms pass."""
    return embeddings.pca_check(
        load_table(spark, sf_dir, "embeddings"), k=8, var_tenths=1
    )


@register("shard_assignment", packing_mod.assign_shards_oracle_sql(n_shards=8))
def q_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced output sharding (write-side layout planning): the global
    token line cut into 8 equal-token spans via the distributed prefix sum;
    pure integer arithmetic, no float drift."""
    return packing_mod.assign_shards(load_table(spark, sf_dir, "documents"), n_shards=8)


@register(
    "ingest_dedup_bloom",
    """
    WITH corpus AS (SELECT text FROM documents WHERE doc_id < 400),
    incoming AS (
        SELECT doc_id, text FROM documents WHERE doc_id >= 400
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 50
    )
    SELECT i.doc_id FROM incoming i
    WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = i.text)
    """,
)
def q_ingest_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter ingest dedup: the zero-corpus-shuffle twin of
    ingest_dedup — broadcast ~128 KB Bloom word table pre-filter + exact
    verify of the (tiny) candidate set against a map-side corpus scan. Same
    incoming/corpus split and the SAME oracle as ingest_dedup, so the two
    designs are independently held to identical output."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    recrawl = docs.filter(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10000)
    )
    incoming = docs.filter(F.col("doc_id") >= 400).unionByName(recrawl)
    return dedup.ingest_dedup_bloom(incoming, corpus).select("doc_id")


# Simulated snapshot pair derived deterministically from the documents table:
# snapshot A drops doc_id % 10 = 3 (they become "added" in B... no: A lacks
# them, B has them), snapshot B drops doc_id % 10 = 7 ("removed") and edits
# doc_id % 10 = 5 by appending a revision marker ("changed").
_SNAP_OLD_SQL = "SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 3"
_SNAP_NEW_SQL = (
    "SELECT doc_id, CASE WHEN doc_id % 10 = 5 THEN text || ' [rev2]' ELSE text END AS text "
    "FROM documents WHERE doc_id % 10 <> 7"
)


@register(
    "corpus_snapshot_diff",
    versioning.snapshot_diff_oracle_sql(_SNAP_OLD_SQL, _SNAP_NEW_SQL),
)
def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (incremental-reprocessing planner): added / removed /
    changed doc ids between two corpus snapshots via a full-outer join of
    16-byte (id, xxhash64(text)) projections — document text never shuffles,
    output is proportional to churn, unchanged rows are dropped."""
    docs = load_table(spark, sf_dir, "documents")
    old_snap = docs.filter(F.col("doc_id") % 10 != 3).select("doc_id", "text")
    new_snap = docs.filter(F.col("doc_id") % 10 != 7).select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 5, F.concat(F.col("text"), F.lit(" [rev2]")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return versioning.snapshot_diff(old_snap, new_snap)


@register("bpe_pair_counts", text.bpe_pair_counts_oracle_sql(k=50))
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-candidate table (one tokenizer-training iteration): top-50
    adjacent character pairs by corpus frequency — pair generation runs over
    the VOCABULARY weighted by word counts, never re-scanning the corpus per
    pair; completes the tokenizer precursor family next to vocab_top_terms
    and token_stats."""
    return text.bpe_pair_counts(load_table(spark, sf_dir, "documents"), k=50)


@register("bpe_merge_steps", text.bpe_merge_train_oracle_sql(steps=4))
def q_bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE tokenizer TRAINING (4 merge rounds): count pairs → pick
    the most frequent → merge it across the vocabulary → repeat; returns the
    learned merge table. Corpus-sized work happens once (the word count);
    each round is vocabulary-bounded with a broadcast argmax — the loop
    bpe_pair_counts computes one iteration of (r05 VERDICT directive 4).
    Oracle unrolls the same 4 rounds as chained DuckDB CTEs with a
    list_reduce merge fold. This is the tokenizer's BUILD query: it always
    retrains fresh and publishes the merge table as the session's standing
    artifact, which bpe_encode consumes — a trained tokenizer is applied many
    times, trained once."""
    pairs = text.bpe_merge_train(
        load_table(spark, sf_dir, "documents"), steps=4
    ).localCheckpoint()
    return standing_put(spark, ("bpe_merges", sf_dir, 4), pairs)


def _bpe_merges_cached(spark: SparkSession, sf_dir: str, steps: int = 4) -> DataFrame:
    return standing_artifact(
        spark,
        ("bpe_merges", sf_dir, steps),
        lambda: text.bpe_merge_train(
            load_table(spark, sf_dir, "documents"), steps=steps
        ).localCheckpoint(),
    )


def _bpe_store_path(sf_dir: str, steps: int) -> str:
    """Stable cross-session store location for the trained merge table,
    keyed by corpus IDENTITY (path + documents.parquet size/mtime): a
    regenerated fixture or different SF can never be served a stale
    tokenizer. Root overridable via SPARK_GRAFT_STORE_DIR (defaults to the
    system temp dir — the store is a cache, not a deliverable)."""
    import hashlib
    import os
    import tempfile

    root = os.environ.get("SPARK_GRAFT_STORE_DIR") or os.path.join(
        tempfile.gettempdir(), "kda_spark_standing"
    )
    doc = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(doc)
        ident = f"{os.path.abspath(doc)}|{st.st_size}|{st.st_mtime_ns}|{steps}"
    except OSError:  # non-local fs: fall back to path identity
        ident = f"{os.path.abspath(doc)}|{steps}"
    key = hashlib.sha1(ident.encode()).hexdigest()[:16]
    return os.path.join(root, f"bpe_merges_{key}")


@register("bpe_encode_stored", text.bpe_encode_oracle_sql(steps=4))
def q_bpe_encode_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encode through the PERSISTENT merge-table store
    (streaming/standing_stores.py: train_bpe_to_store /
    bpe_merges_from_store): a tokenizer trained in one SESSION encodes in
    the next — the production shape, where the merge table is a versioned
    artifact, not a session object. First run trains and crash-safe-promotes
    the store (``.next`` staging + delete/rename); every later run — or a
    run after a mid-promote crash — loads it back and pays apply cost only.
    Training is deterministic for a fixed corpus and the store key carries
    the corpus identity, so stored-vs-fresh output is identical (the
    equality the crash-recovery tests pin) and the bpe_encode oracle
    hash-checks it exactly."""
    from kda_flink_demo_spark.streaming.standing_stores import (
        bpe_merges_from_store,
        train_bpe_to_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = _bpe_store_path(sf_dir, steps=4)
    # The store contract is single-writer (store.py's promote raises on a
    # concurrent rename). Two sessions racing the same cold store — bench and
    # pytest on the same corpus, say — must degrade gracefully, not fail the
    # query: on ANY store-path error, fall back to the session-local merge
    # table (identical output — training is deterministic for this corpus).
    try:
        merges = bpe_merges_from_store(spark, path)
        if merges is None:
            train_bpe_to_store(docs, path, steps=4)
            merges = bpe_merges_from_store(spark, path)
        # materialize through the store NOW: a concurrent writer deleting the
        # store mid-promote must surface here (and fall back), not mid-encode
        merges = merges.localCheckpoint()
    except Exception:  # noqa: BLE001 — lost the store race; train in-session
        merges = None
    return text.bpe_encode(docs, steps=4, merges=merges)


@register("bpe_encode", text.bpe_encode_oracle_sql(steps=4))
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLY: encode every document with the 4 learned merges —
    the full tokenizer loop. Consumes the session's standing merge table
    (trained by bpe_merge_steps or on first use); encoding is
    vocabulary-bounded (each distinct word folded once, merges broadcast);
    documents join the encoded vocab on the word and reassemble in order.
    tokens_text renders every merge boundary, so the oracle catches any
    mis-placed merge corpus-wide."""
    return text.bpe_encode(
        load_table(spark, sf_dir, "documents"),
        steps=4,
        merges=_bpe_merges_cached(spark, sf_dir, 4),
    )


def _leakage_split_oracle() -> str:
    from kda_flink_demo_spark.operators.llm.clustering import (
        leakage_safe_split_case_sql,
    )

    case = leakage_safe_split_case_sql("coalesce(comp.canonical_id, d.doc_id)")
    return (
        _CLUSTERS_CTE
        + f"""
    SELECT d.doc_id,
           coalesce(comp.canonical_id, d.doc_id) AS canonical_id,
           {case} AS split
    FROM documents d LEFT JOIN comp ON d.doc_id = comp.u
"""
    )


@register("leakage_safe_split", _leakage_split_oracle())
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/val/test split: the md5 split hash keys on each
    document's near-dup COMPONENT canonical id (from the standing LSH pair
    graph), so whole clusters land in one split and near-duplicate leakage
    across the train/eval boundary is zero BY CONSTRUCTION — the benchmark-
    contamination guard a plain per-doc hash split (dataset_split) lacks.
    Oracle: the recursive-CTE component closure + identical integer md5
    thresholds. Clusters ≪ corpus → broadcast left join; hash + CASE are
    map-side; one corpus scan."""
    from kda_flink_demo_spark.operators.llm import clustering

    docs = load_table(spark, sf_dir, "documents")
    clusters = clustering.dedup_clusters(docs, _lsh_pairs_cached(spark, sf_dir))
    return clustering.leakage_safe_split(docs, clusters)


@register("embedding_pq", embeddings.pq_oracle_sql(m=8, subdim=8, k=16, iters=2))
def q_embedding_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization over the embeddings table: per-subspace Lloyd
    codebooks (8 subspaces × 16 centroids, 2 assignment rounds) trained and
    applied in ONE declarative plan — 64 doubles compress to 8 codes. Each
    output row carries the assigned code and exact subspace reconstruction
    error; the oracle unrolls the identical rounds as DuckDB CTEs (same
    md5-ordered seeding, same det-rounded distances, same tie-breaks), so
    codes AND errors hash-match."""
    return embeddings.pq_encode(load_table(spark, sf_dir, "embeddings"))


def _pq_index_cached(spark: SparkSession, sf_dir: str):
    """The session's standing PQ search index over the embeddings table
    (normalized corpus + codes + codebook) — trained once per session by
    pq_index_build or on first ADC use, like the LSH pair graph."""
    return standing_artifact(
        spark,
        ("pq_index", sf_dir),
        lambda: similarity.build_pq_index(load_table(spark, sf_dir, "embeddings")),
    )


@register(
    "pq_index_build",
    embeddings.pq_oracle_sql(m=8, subdim=8, k=16, iters=2, normalized=True),
)
def q_pq_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ index BUILD (normalize → per-subspace Lloyd codebooks → encode),
    refreshed into the session standing cache — its benched time is the
    honest offline-training cost the ADC query then consumes (the
    fuzzy_ingest_index_build convention). Oracle: the unrolled-CTE PQ oracle
    over L2-normalized vectors; returns the standing code table, so codes AND
    subspace reconstruction errors hash-match."""
    idx = standing_put(
        spark,
        ("pq_index", sf_dir),
        similarity.build_pq_index(load_table(spark, sf_dir, "embeddings")),
    )
    return idx[1]


@register("similarity_pq_adc", _ANN_RECALL_ORACLE)
def q_similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-5 (ADC scan over the 8-byte codes →
    shortlist → exact rerank of 300 candidates), made hash-checkable exactly
    like similarity_ann_lsh: brute-force top-5 evidence the oracle verifies,
    plus a pinned recall@5 ≥ 0.5 boolean from the fully deterministic PQ
    branch (md5-seeded codebooks, integer micro-unit ADC sums). Measured
    per-query recall floor at shortlist=300/k=16/iters=2: 0.6 at sf0.01,
    0.8 at sf0.1 — the 0.5 pin leaves a bucket of margin against fixture
    regeneration (a heavier 32×3 codebook bought no floor and 2× the cost)."""
    return similarity.ann_recall_report(
        load_table(spark, sf_dir, "embeddings"),
        query_ids=[0, 1, 2, 3, 4],
        k=5,
        method="pq",
        recall_tenths=5,
        shortlist=300,
        index=_pq_index_cached(spark, sf_dir),
    )


@register(
    "text_novelty",
    text.novelty_score_oracle_sql(
        ref_pred="doc_id % 5 = 0", probe_pred="doc_id % 5 <> 0"
    ),
)
def q_text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc trigram novelty vs a reference corpus (contamination's
    inverse): fraction of a doc's distinct trigrams unseen in the reference,
    in integer basis points. Reference = every 5th doc, probe = the rest.
    The reference collapses once to broadcast gram hashes; the oracle joins
    on the gram string, so a hash collision would fail the row."""
    docs = load_table(spark, sf_dir, "documents")
    return text.novelty_score(
        docs.filter(F.col("doc_id") % 5 != 0),
        docs.filter(F.col("doc_id") % 5 == 0),
    )


def _build_bm25_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.bm25_stats_state(load_table(spark, sf_dir, "documents")).localCheckpoint()


def _bm25_stats_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    return standing_artifact(
        spark, ("bm25_stats", sf_dir), lambda: _build_bm25_stats(spark, sf_dir)
    )


@register("bm25_stats_build", text.bm25_stats_oracle_sql())
def q_bm25_stats_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standing BM25 corpus-stats BUILD (r12 verdict directive 7): every
    corpus quantity the scoring formula reads — per-term df, N, total token
    count — as ONE mergeable algebraic state table (term rows + a NULL-term
    global row; merge = grouped sum, the agg_state convention). Always
    rebuilds fresh (honest construction cost, split from retrieval) and
    refreshes the session's standing artifact that bm25_retrieval consumes.
    The oracle recomputes the full state in DuckDB."""
    idx = standing_put(
        spark, ("bm25_stats", sf_dir), _build_bm25_stats(spark, sf_dir)
    )
    return idx


@register("bm25_stats_merge", text.bm25_stats_oracle_sql())
def q_bm25_stats_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the BM25 stats: the corpus split into two
    slices (doc_id parity), each reduced to its own stats state, merged by
    merge_bm25_stats WITHOUT rescanning either slice — and the oracle is the
    DIRECT full-corpus state, so merge-equals-one-shot is externally
    hash-pinned. This is how an ingest deployment keeps retrieval scoring
    stats standing: each batch contributes a vocabulary-sized state row set,
    old slices are never touched again."""
    docs = load_table(spark, sf_dir, "documents")
    a = text.bm25_stats_state(docs.filter(F.col("doc_id") % 2 == 0))
    b = text.bm25_stats_state(docs.filter(F.col("doc_id") % 2 == 1))
    return text.merge_bm25_stats(a, b)


@register("bm25_retrieval", text.bm25_oracle_sql())
def q_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 retrieval for a fixed 4-query set over the documents
    corpus — the retrieval twin of inverted_index/tfidf (an LLM pipeline uses
    this shape for eval-set mining and RAG-corpus selection). Scale shape:
    the exploded term stream semi-joins the BROADCAST query vocabulary before
    any aggregate (shuffled volume = query-term postings, never the corpus),
    doc length rides the posting rows, and (r13) df/N/avgdl come from the
    session's STANDING mergeable stats artifact (bm25_stats_build) instead
    of live corpus aggregates — the candidate postings are the only corpus
    read. The per-query top-k ranks on the det_round(6) score with a doc_id
    tie-break so ln() ulp differences can't flip an order across engines.
    The oracle recomputes the full scoring formula in DuckDB."""
    return text.bm25_topk(
        load_table(spark, sf_dir, "documents"),
        stats=_bm25_stats_cached(spark, sf_dir),
    )


def _hybrid_rrf_oracle_sql(k: int = 10, list_k: int = 20, k0: int = 60) -> str:
    """DuckDB twin of the hybrid retriever: the full BM25 ranking (same CTE
    structure as bm25_oracle_sql, list_k deep), the full brute-cosine
    ranking (the _TOPK_ORACLE structure for query vectors 1–4), and the RRF
    fusion 1/(k0+rank) summed per (query, doc)."""
    from kda_flink_demo_spark.operators.llm.text import BM25_QUERIES

    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in BM25_QUERIES.items() for t in terms
    )
    return f"""
    WITH q(query_id, term) AS (VALUES {qvals}),
    sterms AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    spruned AS (
        SELECT doc_id, term FROM sterms
        WHERE term IN (SELECT DISTINCT term FROM q)
    ),
    stf AS (SELECT doc_id, term, count(*) AS tf FROM spruned GROUP BY 1, 2),
    sdfreq AS (SELECT term, count(*) AS df FROM stf GROUP BY 1),
    sdl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    sstats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM sdl),
    sscored AS (
        SELECT q.query_id, stf.doc_id,
               floor(sum(
                   ln((sstats.n_docs - sdfreq.df + 0.5) / (sdfreq.df + 0.5) + 1.0)
                   * (stf.tf * 2.2)
                   / (stf.tf + 1.2 * (0.25 + 0.75 * sdl.dl / sstats.avgdl))
               ) * 1000000.0 + 0.5) / 1000000.0 AS score
        FROM stf
        JOIN q USING (term)
        JOIN sdl USING (doc_id)
        JOIN sdfreq USING (term)
        CROSS JOIN sstats
        GROUP BY 1, 2
    ),
    sranked AS (
        SELECT query_id, doc_id,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, doc_id) AS r
        FROM sscored
    ),
    n AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    ),
    dq AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
           WHERE vec_id IN (1, 2, 3, 4)),
    dpairs AS (
        SELECT dq.query_id, n.vec_id AS doc_id,
               floor(list_dot_product(dq.qv, n.v) / (dq.qn * n.nrm)
                     * 1000000.0 + 0.5) / 1000000.0 AS cosine
        FROM dq JOIN n ON n.vec_id != dq.query_id
    ),
    dranked AS (
        SELECT query_id, doc_id,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS r
        FROM dpairs
    ),
    u AS (
        SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
               1.0 / ({k0} + r) AS c
        FROM sranked WHERE r <= {list_k}
        UNION ALL
        SELECT CAST(query_id AS BIGINT), doc_id, 1.0 / ({k0} + r)
        FROM dranked WHERE r <= {list_k}
    ),
    fs AS (
        SELECT query_id, doc_id,
               floor(sum(c) * 1000000.0 + 0.5) / 1000000.0 AS rrf_score
        FROM u GROUP BY 1, 2
    )
    SELECT query_id, doc_id, rrf_score, CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rank
        FROM fs
    ) WHERE rank <= {k}
    """


@register("hybrid_rrf_retrieval", _hybrid_rrf_oracle_sql())
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (r13): BM25's lexical
    top-20 fused with the brute-cosine semantic top-20 over the parallel
    embeddings table (vec_id ≡ doc_id in the fixture; query vectors are the
    embeddings of doc_ids 1–4, matching the fixed BM25 query ids) —
    fused_score = Σ 1/(60+rank), the calibration-free standard for
    combining incomparable score scales. Both underlying rankings AND the
    fusion are recomputed end-to-end by the DuckDB oracle. Scale shape:
    fusion inputs are list-sized (queries × 20), so the fuse itself is
    free; the cost is the two retrievers, each already scale-shaped
    (posting-pruned BM25, broadcast-query brute scan with IVF/PQ as the ANN
    path)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    sparse = text.bm25_topk(
        docs, k=20, stats=_bm25_stats_cached(spark, sf_dir)
    ).select("query_id", "doc_id", "rank")
    dense = similarity.cosine_topk(emb, query_ids=[1, 2, 3, 4], k=20).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return similarity.rrf_fuse([sparse, dense], k=10)


@register("text_hashed_features", text.hashed_features_oracle_sql(n_features=16))
def q_text_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick document featurizer: fixed 16-bucket term-count vectors
    in sparse COO form via the cross-engine md5 bucket — no vocabulary
    artifact, so any corpus slice featurizes identically with zero
    coordination. One partial→final (doc, bucket) aggregate."""
    return text.hashed_features(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Perceptual image/audio dedup — driver-checkable surface (round 9).
# The corpus is synthesized per documents row as a pure function of doc_id
# (see synth_media.py): group g = doc_id % 20 picks a far-apart codeword,
# variant v = least(doc_id // 20, 3) applies v designed flips, and brightness/
# volume perturbations vary the bytes without moving the hash. The true pair
# structure is therefore closed-form SQL — the full decode→hash→quarter-block
# →verify pipeline must reproduce it EXACTLY to hash-match.
# Since r12 the rows READ the corpus from synth_media.staged() — a once-per-
# session parquet artifact, bit-identical to inline synthesis (test-pinned) —
# so the timed cost is the operator, the shape production pays (r11 dir. 1).
# ---------------------------------------------------------------------------

_MEDIA_GV = """
    SELECT doc_id, doc_id % 20 AS g, least(doc_id // 20, 3) AS v FROM documents
"""

_IMAGE_PAIRS_ORACLE = (
    "WITH d AS (" + _MEDIA_GV + "), "
    "p AS (SELECT abs(a.v - b.v) AS ham FROM d a JOIN d b "
    "      ON a.g = b.g AND a.doc_id < b.doc_id) "
    "SELECT CAST(ham AS INT) AS hamming, count(*) AS n_pairs FROM p GROUP BY 1"
)


@register("image_dedup_report", _IMAGE_PAIRS_ORACLE)
def q_image_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup pairs (aHash + 16-bit-quarter blocking +
    JVM popcount verify) over the synthesized PPM corpus, reported as the
    Hamming-distance histogram of the pair graph. The oracle recomputes the
    histogram from the corpus design in closed form: same-group pairs sit at
    EXACTLY |v_a − v_b| ≤ 3 (inside the pigeonhole-exact blocking radius),
    cross-group pairs at ≥ 18 (outside max_hamming=5) — so precision and
    recall are both provably exact and any pipeline defect (decode, luma,
    resize, threshold, packing, blocking, verify) flips the hash."""
    imgs = synth_media.staged(spark, sf_dir, "images")
    pairs = image_dedup.image_near_dup_pairs(imgs, max_hamming=5)
    return pairs.groupBy("hamming").agg(F.count(F.lit(1)).alias("n_pairs"))


_AUDIO_PAIRS_ORACLE = (
    "WITH d AS (" + _MEDIA_GV + "), "
    "p AS (SELECT 2 * abs(a.v - b.v) AS ham FROM d a JOIN d b "
    "      ON a.g = b.g AND a.doc_id < b.doc_id) "
    "SELECT CAST(ham AS INT) AS hamming, count(*) AS n_pairs FROM p GROUP BY 1"
)


@register("audio_dedup_report", _AUDIO_PAIRS_ORACLE)
def q_audio_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup pairs (energy-envelope fingerprint over decoded WAV
    samples + the shared quarter-block machinery) over the synthesized WAV
    corpus. Audio variants flip popcount-preserving (set, clear) PAIRS — the
    median-energy threshold pins exactly 32 bits — so same-group hamming is
    EXACTLY 2·|v_a − v_b| ≤ 6, each step confined to one quarter (≥ 1 quarter
    always identical → exact recall at max_hamming=6), cross-group ≥ 12."""
    wavs = synth_media.staged(spark, sf_dir, "wavs")
    pairs = image_dedup.audio_near_dup_pairs(wavs, max_hamming=6)
    return pairs.groupBy("hamming").agg(F.count(F.lit(1)).alias("n_pairs"))


# Survivors in closed form for ANY id set (r09 drift-insurance test finding:
# the original `group >= 10` shortcut silently assumed CONTIGUOUS doc_ids —
# with a sparse table some group < 10 can have no indexed member, and its
# batch docs then legitimately survive the within-batch keep-min):
# a batch doc survives iff its group has NO indexed member (same-group
# hamming is always within the gate radius by design) and it is the minimal
# batch doc of its group.
_GATE_ORACLE = """
    WITH idx_groups AS (
        SELECT DISTINCT doc_id % 20 AS g FROM documents
        WHERE doc_id % 3 = 0 AND doc_id % 20 < 10
    )
    SELECT min(doc_id) AS doc_id, doc_id % 20 AS group_id
    FROM documents
    WHERE doc_id % 3 = 1
      AND doc_id % 20 NOT IN (SELECT g FROM idx_groups)
    GROUP BY 2
"""


@register("image_ingest_gate", _GATE_ORACLE)
def q_image_ingest_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-ingest image gate (image_dedup_probe) made
    driver-checkable: the standing index holds groups 0–9 (docs ≡ 0 mod 3),
    the incoming batch is docs ≡ 1 mod 3. Every batch image from an indexed
    group near-dups the index (hamming ≤ 3 ≤ 5) and is dropped; in the ten
    un-indexed groups the within-batch stage keeps only the smallest doc_id
    (all same-group images near-dup each other) — both code paths land in
    the closed-form survivor set the oracle computes."""
    docs = load_table(spark, sf_dir, "documents")
    incoming = synth_media.staged(spark, sf_dir, "images").filter(F.col("doc_id") % 3 == 1)
    index = standing_artifact(
        spark,
        ("ahash_index", sf_dir),
        lambda: image_dedup.image_ahash(
            synth_media.staged(spark, sf_dir, "images").filter(
                (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 20 < 10)
            )
        ).localCheckpoint(),
    )
    survivors = image_dedup.image_dedup_probe(incoming, index, max_hamming=5)
    return survivors.select("doc_id", (F.col("doc_id") % 20).alias("group_id"))


@register("audio_ingest_gate", _GATE_ORACLE)
def q_audio_ingest_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio twin of image_ingest_gate: same survivor closed form, driven
    through audio_ahash fingerprints (batch hashes passed explicitly — the
    probe machinery is hash-agnostic once given the (doc_id, ahash) tables)."""
    docs = load_table(spark, sf_dir, "documents")
    incoming = synth_media.staged(spark, sf_dir, "wavs").filter(F.col("doc_id") % 3 == 1)
    index = standing_artifact(
        spark,
        ("audio_ahash_index", sf_dir),
        lambda: image_dedup.audio_ahash(
            synth_media.staged(spark, sf_dir, "wavs").filter(
                (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 20 < 10)
            )
        ).localCheckpoint(),
    )
    survivors = image_dedup.image_dedup_probe(
        incoming,
        index,
        max_hamming=6,
        batch_hashes=image_dedup.audio_ahash(incoming).localCheckpoint(),
    )
    return survivors.select("doc_id", (F.col("doc_id") % 20).alias("group_id"))





_VIDEO_FRAMES_ORACLE = """
    WITH f AS (
      SELECT doc_id, unnest(range(0, doc_id % 12 + 1, 5)) AS frame_idx FROM documents
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           floor((299 * ((doc_id * 31 + frame_idx * 17) % 256)
                + 587 * ((doc_id * 13 + frame_idx * 7) % 256)
                + 114 * ((doc_id * 29 + frame_idx * 3) % 256)) // 1000
                 / 255.0 * 10000.0 + 0.5) / 10000.0 AS frame_score
    FROM f
"""


@register("video_frame_scores", _VIDEO_FRAMES_ORACLE)
def q_video_frame_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode, driver-checkable (round 9 — completes the modality
    set next to the image/audio perceptual queries): synthesized RIFF/AVI
    payloads (synth_media.synth_videos) through the pure uncompressed-DIB
    frame reader, stride-5 sampling, per-frame integer-luma scores. The
    oracle recomputes every sampled frame's score from the corpus design in
    closed form — a decode defect anywhere (RIFF walk, header parse, row
    padding, bottom-up flip, BGR→RGB, luma) moves some score and fails the
    hash. Compressed codecs stay behind the honest NotImplementedError gate
    naming pyav/ffmpeg."""
    vids = synth_media.staged(spark, sf_dir, "videos")
    return multimodal.sample_video_frames(vids, stride=5, real_decode=True)


_IMAGE_APPLY_ORACLE = """
    WITH m AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY doc_id % 20)
    SELECT d.doc_id, d.source, d.n_chars FROM documents d JOIN m USING (doc_id)
"""


@register("image_dedup_apply", _IMAGE_APPLY_ORACLE)
def q_image_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full BATCH image-dedup pipeline end-to-end: synth corpus → aHash →
    LINEAR-sized connectivity edges (hash_near_dup_edges: per-hash stars +
    one edge per distinct-hash pair at max_hamming=3, the pigeonhole-exact
    radius; components provably equal the full pair graph's, test-pinned) →
    connected components → keep each cluster's minimum-id canonical. By the
    corpus design every group is one complete near-dup component (variant
    patterns sit pairwise ≤ 3 apart), so the surviving corpus is EXACTLY the
    20 per-group minimum ids with their attributes — closed-form SQL. This is
    the text dedup_clusters/dedup_apply_fuzzy shape applied to the multimodal
    column, riding the same connected_components machinery."""
    docs = load_table(spark, sf_dir, "documents")
    edges = image_dedup.image_near_dup_edges(
        synth_media.staged(spark, sf_dir, "images"), max_hamming=3
    )
    clusters = clustering.dedup_clusters(docs, edges)
    return clustering.apply_dedup(docs, clusters)


def _sniff_oracle() -> str:
    """Closed-form oracle for media_sniff_features: the brightness of a synth
    image is 40 + off + 2.5·popcount(pattern), so an 80-row (g, v) → popcount
    VALUES table (computed here from the same hardcoded codewords the corpus
    uses) pins it exactly; audio rms is s·sqrt(4545000)/32768 (64 windows,
    exactly 32 high by design); AVI size is linear in frames (224 + 88·nf)."""
    lut_rows = ", ".join(
        f"({g}, {v}, {bin(synth_media.image_pattern(g + 20 * v)).count('1')})"
        for g in range(20)
        for v in range(4)
    )
    return f"""
    WITH lut(g, v, k) AS (VALUES {lut_rows}),
    d AS (
        SELECT doc_id, doc_id % 20 AS g, least(doc_id // 20, 3) AS v,
               (doc_id // 20) % 8 AS o8, 1 + (doc_id // 20) % 4 AS s,
               doc_id % 4 AS m, doc_id % 12 + 1 AS nf, text
        FROM documents
    )
    SELECT doc_id,
           CASE m WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  WHEN 2 THEN 'video' ELSE 'unknown' END AS modality,
           CAST(CASE m WHEN 0 THEN 16 WHEN 2 THEN 6 END AS INTEGER) AS width,
           CAST(CASE m WHEN 0 THEN 16 WHEN 2 THEN 4 END AS INTEGER) AS height,
           CAST(CASE m WHEN 0 THEN 3 WHEN 1 THEN 1 WHEN 2 THEN 3 END AS INTEGER) AS channels,
           CASE m WHEN 1 THEN 0.256
                  WHEN 2 THEN floor(nf / 10.0 * 10000.0 + 0.5) / 10000.0 END AS duration_sec,
           CASE m WHEN 0 THEN floor((40 + o8 * 5 + lut.k * 2.5) * 10000.0 + 0.5) / 10000.0
               END AS brightness,
           CASE m WHEN 1 THEN floor(sqrt(4545000.0) / 32768 * s * 10000.0 + 0.5) / 10000.0
               END AS rms,
           CAST(CASE m WHEN 0 THEN 781 WHEN 1 THEN 4140 WHEN 2 THEN 224 + 88 * nf
                       ELSE octet_length(encode(coalesce(text, ''))) + 1 END AS BIGINT) AS n_bytes
    FROM d LEFT JOIN lut ON lut.g = d.g AND lut.v = d.v
    """


@register("media_sniff_features", _sniff_oracle())
def q_media_sniff_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-format media LAKE scan, driver-checkable: the corpus interleaves
    all three synthetic containers plus junk text payloads by doc_id % 4, and
    ``sniff_media_features`` must dispatch each row by magic bytes through the
    matching REAL decoder into one unified feature table — geometry + exact
    integer-luma brightness for images (the oracle pins it via an 80-row
    popcount table computed from the same codeword constants), duration + rms
    for audio (closed-form: exactly 32 high-energy windows by design),
    geometry + duration for video, 'unknown' quarantine for the junk (its
    '#' prefix can never match a magic). A dispatch, decode, or rounding
    defect anywhere moves some cell and fails the hash."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    imgs = synth_media.staged(spark, sf_dir, "images").filter(d % 4 == 0)
    wavs = synth_media.staged(spark, sf_dir, "wavs").filter(d % 4 == 1)
    vids = synth_media.staged(spark, sf_dir, "videos").filter(d % 4 == 2)
    junk = docs.filter(d % 4 == 3).select(
        "doc_id",
        # coalesce: a NULL text must quarantine as a 1-byte unknown payload,
        # not NULL out the whole row (fixtures regenerate every round)
        F.encode(
            F.concat(F.lit("#"), F.coalesce(F.col("text"), F.lit(""))), "UTF-8"
        ).alias("payload"),
    )
    corpus = imgs.unionByName(wavs).unionByName(vids).unionByName(junk)
    return multimodal.sniff_media_features(corpus)


@register("video_dedup_report", _IMAGE_PAIRS_ORACLE)
def q_video_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup pairs via the temporal-MAJORITY fingerprint
    (video_ahash: per-frame canonical aHash bits, majority across frames)
    over the designed pattern-video corpus — whose minority of bit-INVERTED
    frames the vote must suppress exactly, so a mean- or first-frame
    implementation hash-fails. Fingerprints then equal image_pattern(doc_id),
    making the pair histogram the SAME closed form as the image report
    (|v_a − v_b| per same-group pair, cross-group unreachable)."""
    vids = synth_media.staged(spark, sf_dir, "pattern_videos")
    pairs = image_dedup.video_near_dup_pairs(vids, max_hamming=5)
    return pairs.groupBy("hamming").agg(F.count(F.lit(1)).alias("n_pairs"))


def _pattern_lut_sql() -> str:
    """80-row (g, v) → signed-int64 pattern VALUES table, generated from the
    same hardcoded codeword constants the corpus uses — the strongest
    possible external pin: the oracle recomputes every raw hash VALUE."""
    rows = []
    for g in range(20):
        for v in range(4):
            w = synth_media.image_pattern(g + 20 * v)
            rows.append(f"({g}, {v}, {w - (1 << 64) if w >= 1 << 63 else w})")
    return ", ".join(rows)


_AHASH_VALUES_ORACLE = f"""
    WITH lut(g, v, h) AS (VALUES {_pattern_lut_sql()})
    SELECT d.doc_id, CAST(lut.h AS BIGINT) AS ahash
    FROM (SELECT doc_id, doc_id % 20 AS g, least(doc_id // 20, 3) AS v
          FROM documents) d
    JOIN lut ON lut.g = d.g AND lut.v = d.v
"""


@register("image_ahash_values", _AHASH_VALUES_ORACLE)
def q_image_ahash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw decode+hash scan, externally value-pinned: every 64-bit aHash
    over the synth corpus must equal the designed pattern VERBATIM (the
    oracle joins an 80-row signed-pattern table generated from the same
    hardcoded codeword constants). This pins the exact bit layout — luma
    formula, nearest-resize indices, mean threshold, MSB-first packing,
    two's-complement — not just pair distances."""
    return image_dedup.image_ahash(
        synth_media.staged(spark, sf_dir, "images")
    )


@register("png_ahash_values", _AHASH_VALUES_ORACLE)
def q_png_ahash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PNG decode path, externally value-pinned (round 10 — the first
    COMPRESSED container through the real-decode gate; PNG's only compression
    is RFC-1951 inflate, which the stdlib ships, so unlike JPEG/H.264 it does
    not have to stay behind the PIL gate). ``synth_media.synth_pngs`` carries
    the SAME designed patterns as the PPM corpus in real PNG containers —
    cycling color type 0/2/3/6 by doc_id and scanline filters 0..4 by row —
    so every 64-bit aHash must equal ``image_pattern(doc_id)`` VERBATIM
    through inflate → unfilter (all five reconstructions load-bearing) →
    palette expansion → luma → resize → threshold. Same signed-pattern LUT
    oracle as image_ahash_values, reached through a completely different
    byte path."""
    return image_dedup.image_ahash(
        synth_media.staged(spark, sf_dir, "pngs")
    )


@register("gif_ahash_values", _AHASH_VALUES_ORACLE)
def q_gif_ahash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF through the real-decode path, externally value-pinned (round 10,
    alongside PNG): ``synth_media.synth_gifs`` carries the designed patterns
    as 2-entry-palette LZW-compressed GIFs (odd docs row-interlaced), and GIF
    is lossless, so every 64-bit aHash must equal ``image_pattern(doc_id)``
    VERBATIM through the LZW decompressor (variable code widths, CLEAR
    resets, the KwKwK case) → palette lookup → 4-pass interlace reassembly →
    luma. Same signed-pattern LUT oracle as image/png_ahash_values — a third
    independent byte path into the same pinned values."""
    return image_dedup.image_ahash(
        synth_media.staged(spark, sf_dir, "gifs")
    )


@register("mjpeg_video_ahash_values", _AHASH_VALUES_ORACLE)
def q_mjpeg_video_ahash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A COMPRESSED video codec through the real multi-frame decode path,
    externally value-pinned (round 10): Motion-JPEG AVIs — every frame a
    standalone baseline JPEG in an 'MJPG' chunk — through ``video_ahash``'s
    temporal-MAJORITY fingerprint. The corpus upscales each pattern bit to
    an 8×8-CONSTANT JPEG block (DC-only ⇒ exact through the lossy codec) and
    keeps the designed minority of inverted frames, so every 64-bit
    fingerprint must equal ``image_pattern(doc_id)`` against the same
    signed-pattern LUT — reached through RIFF walk → per-frame JPEG Huffman
    decode → IDCT → gray→RGB expansion → per-frame hash → majority vote."""
    return image_dedup.video_ahash(
        synth_media.staged(spark, sf_dir, "mjpeg_videos")
    )


@register("jpeg_ahash_values", _AHASH_VALUES_ORACLE)
def q_jpeg_ahash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASELINE JPEG through the real-decode path, externally value-pinned
    (round 10 — the archetypal 'compressed codec behind the PIL gate', now a
    pure-numpy decoder: marker parse, Huffman entropy decode with byte
    unstuffing and restart markers, dequant, dezigzag, exact float64 IDCT).
    Pinning a LOSSY format exactly: the corpus makes every pattern bit an
    8×8-CONSTANT block, whose DC-only transform round-trips verbatim at the
    encoder's DC quant step of 8 — so every 64-bit aHash must equal
    ``image_pattern(doc_id)`` against the same signed-pattern LUT as the
    PPM/PNG/GIF corpora (a fourth independent byte path). A third of the
    corpus carries restart intervals, making RST handling and DC-predictor
    resets load-bearing."""
    return image_dedup.image_ahash(
        synth_media.staged(spark, sf_dir, "jpegs")
    )


def _png_sniff_oracle() -> str:
    """Closed form for the PNG corpus through the mixed-format sniff scan:
    geometry is fixed 16×16, decoded channels follow the color-type cycle
    (gray 1, RGB 3, palette→RGB 3, RGBA 4), and brightness is the image
    corpus's 40 + off + 2.5·popcount(pattern) for EVERY color type (equal-
    channel integer luma reproduces the gray level exactly; alpha ignored).
    n_bytes is deliberately not selected — zlib output length is
    deterministic but not SQL-expressible."""
    lut_rows = ", ".join(
        f"({g}, {v}, {bin(synth_media.image_pattern(g + 20 * v)).count('1')})"
        for g in range(20)
        for v in range(4)
    )
    return f"""
    WITH lut(g, v, k) AS (VALUES {lut_rows})
    SELECT doc_id, 'image' AS modality,
           CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
           CAST(CASE d.m WHEN 0 THEN 1 WHEN 3 THEN 4 ELSE 3 END AS INTEGER) AS channels,
           floor((40 + d.o8 * 5 + lut.k * 2.5) * 10000.0 + 0.5) / 10000.0 AS brightness
    FROM (SELECT doc_id, doc_id % 20 AS g, least(doc_id // 20, 3) AS v,
                 (doc_id // 20) % 8 AS o8, doc_id % 4 AS m
          FROM documents) d
    JOIN lut ON lut.g = d.g AND lut.v = d.v
    """


@register("png_sniff_features", _png_sniff_oracle())
def q_png_sniff_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PNG corpus through ``sniff_media_features``' magic-byte dispatch:
    the 8-byte PNG signature must route to the image decoder and the decoded
    GEOMETRY + CHANNELS + integer-luma brightness must match the corpus
    design — the channel count varies with the color-type cycle, so a decoder
    that flattened palette indices wrong or dropped/kept alpha in the wrong
    place moves a cell. n_bytes/duration/rms are excluded (compressed size is
    not closed-form; the full nullable schema is already pinned by
    media_sniff_features)."""
    feats = multimodal.sniff_media_features(
        synth_media.staged(spark, sf_dir, "pngs")
    )
    return feats.select("doc_id", "modality", "width", "height", "channels", "brightness")


@register(
    "image_ahash_index_build",
    _AHASH_VALUES_ORACLE.replace(
        "FROM documents) d", "FROM documents WHERE doc_id % 3 = 0 AND doc_id % 20 < 10) d"
    ),
)
def q_image_ahash_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILD query for the image ingest gate's standing index (the
    fuzzy_ingest_index_build convention): always rebuilds fresh — its benched
    time is the honest one-time index construction cost — and refreshes the
    session artifact the gate then probes, so the gate's benched time is the
    recurring PER-BATCH cost a production deployment actually pays (hash the
    batch + probe the standing index), not an index rebuild per batch.
    Oracle: the signed-pattern LUT restricted to the indexed slice."""
    docs = load_table(spark, sf_dir, "documents")
    idx = image_dedup.image_ahash(
        synth_media.staged(spark, sf_dir, "images").filter(
            (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 20 < 10)
        )
    ).localCheckpoint()
    return standing_put(spark, ("ahash_index", sf_dir), idx)


def _audio_lut_sql() -> str:
    rows = []
    for g in range(20):
        for v in range(4):
            w = synth_media.audio_pattern(g + 20 * v)
            rows.append(f"({g}, {v}, {w - (1 << 64) if w >= 1 << 63 else w})")
    return ", ".join(rows)


@register(
    "audio_ahash_values",
    f"""
    WITH lut(g, v, h) AS (VALUES {_audio_lut_sql()})
    SELECT d.doc_id, CAST(lut.h AS BIGINT) AS ahash
    FROM (SELECT doc_id, doc_id % 20 AS g, least(doc_id // 20, 3) AS v
          FROM documents) d
    JOIN lut ON lut.g = d.g AND lut.v = d.v
    """,
)
def q_audio_ahash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw WAV decode + energy-envelope fingerprint scan, externally
    value-pinned like image_ahash_values: every 64-bit fingerprint must equal
    the designed audio pattern VERBATIM (80-row signed-pattern LUT from the
    same constants) — pinning the stdlib WAV parse, per-window energy fold,
    median threshold, and volume invariance bit-for-bit."""
    return image_dedup.audio_ahash(
        synth_media.staged(spark, sf_dir, "wavs")
    )


@register("video_ahash_values", _AHASH_VALUES_ORACLE)
def q_video_ahash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw AVI decode + temporal-MAJORITY fingerprint scan, externally
    value-pinned: the pattern-video corpus (with its minority of inverted
    frames) must fingerprint to image_pattern(doc_id) VERBATIM — the same
    signed-pattern LUT as image_ahash_values, reached through a completely
    different kernel (multi-frame decode, per-frame hash, majority vote)."""
    return image_dedup.video_ahash(
        synth_media.staged(spark, sf_dir, "pattern_videos")
    )


@register(
    "wav_width_ahash_values",
    f"""
    WITH lut(g, v, h) AS (VALUES {_audio_lut_sql()})
    SELECT d.doc_id, CAST(lut.h AS BIGINT) AS ahash
    FROM (SELECT doc_id, doc_id % 20 AS g, least(doc_id // 20, 3) AS v
          FROM documents) d
    JOIN lut ON lut.g = d.g AND lut.v = d.v
    """,
)
def q_wav_width_ahash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every integer-PCM sample width through the WAV decode path, externally
    value-pinned (round 10): ``synth_wavs_widths`` carries the designed
    energy envelope at 8/16/24/32-bit cycling by doc_id, so the fingerprint
    must equal ``audio_pattern(doc_id)`` VERBATIM through all four
    normalizations (unsigned-midpoint 8-bit, signed LE 16/32-bit,
    sign-extended 24-bit triplets). Same signed audio-pattern LUT oracle as
    audio_ahash_values — a width-specific scaling or sign-extension defect
    flips envelope bits for exactly that width's cohort and fails the hash."""
    return image_dedup.audio_ahash(
        synth_media.staged(spark, sf_dir, "wavs_widths")
    )


@register(
    "audio_ahash_index_build",
    f"""
    WITH lut(g, v, h) AS (VALUES {_audio_lut_sql()})
    SELECT d.doc_id, CAST(lut.h AS BIGINT) AS ahash
    FROM (SELECT doc_id, doc_id % 20 AS g, least(doc_id // 20, 3) AS v
          FROM documents WHERE doc_id % 3 = 0 AND doc_id % 20 < 10) d
    JOIN lut ON lut.g = d.g AND lut.v = d.v
    """,
)
def q_audio_ahash_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILD query for the audio ingest gate's standing fingerprint index
    (mirrors image_ahash_index_build): always rebuilds fresh, refreshes the
    session artifact the audio gate probes; oracle = the signed audio-pattern
    LUT restricted to the indexed slice."""
    docs = load_table(spark, sf_dir, "documents")
    idx = image_dedup.audio_ahash(
        synth_media.staged(spark, sf_dir, "wavs").filter(
            (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 20 < 10)
        )
    ).localCheckpoint()
    return standing_put(spark, ("audio_ahash_index", sf_dir), idx)


@register(
    "video_ahash_index_build",
    _AHASH_VALUES_ORACLE.replace(
        "FROM documents) d", "FROM documents WHERE doc_id % 3 = 0 AND doc_id % 20 < 10) d"
    ),
)
def q_video_ahash_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILD query for the VIDEO ingest gate's standing fingerprint index —
    the third modality through the image/audio BUILD-split convention (r09
    verdict directive 2: the standing video gate existed but was
    pytest-only). Pattern videos fingerprint to ``image_pattern(doc_id)``
    VERBATIM (the temporal majority suppresses the designed minority of
    inverted frames), so the oracle is the SAME signed-pattern LUT as the
    image index build, reached through the multi-frame decode + majority
    kernel."""
    docs = load_table(spark, sf_dir, "documents")
    idx = image_dedup.video_ahash(
        synth_media.staged(spark, sf_dir, "pattern_videos").filter(
            (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 20 < 10)
        )
    ).localCheckpoint()
    return standing_put(spark, ("video_ahash_index", sf_dir), idx)


@register("video_ingest_gate", _GATE_ORACLE)
def q_video_ingest_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video twin of image/audio_ingest_gate (same modality-independent
    survivor closed form): incoming pattern videos (docs ≡ 1 mod 3) probe the
    standing video fingerprint index (groups 0–9, docs ≡ 0 mod 3) through the
    hash-agnostic gate machinery — driver-checkable since r10; previously the
    standing video gate ran only in pytest (tests/test_round9_ops.py,
    ``hasher=video_ahash``). Video fingerprints equal image patterns by the
    corpus design, so same-group hamming ≤ 3 ≤ 5 and the image gate's closed
    form transfers verbatim."""
    docs = load_table(spark, sf_dir, "documents")
    incoming = synth_media.staged(spark, sf_dir, "pattern_videos").filter(F.col("doc_id") % 3 == 1)
    index = standing_artifact(
        spark,
        ("video_ahash_index", sf_dir),
        lambda: image_dedup.video_ahash(
            synth_media.staged(spark, sf_dir, "pattern_videos").filter(
                (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 20 < 10)
            )
        ).localCheckpoint(),
    )
    survivors = image_dedup.image_dedup_probe(
        incoming,
        index,
        max_hamming=5,
        batch_hashes=image_dedup.video_ahash(incoming).localCheckpoint(),
    )
    return survivors.select("doc_id", (F.col("doc_id") % 20).alias("group_id"))


def _profile_lut_sql() -> str:
    """80-row (g, v, k, hi, ha) VALUES table for the fused ingest profile:
    k = popcount of the image pattern (pins brightness), hi/ha = the signed
    image/audio pattern values (pin the fingerprints) — all generated from
    the same hardcoded codeword constants the corpus uses."""
    rows = []
    for g in range(20):
        for v in range(4):
            wi = synth_media.image_pattern(g + 20 * v)
            wa = synth_media.audio_pattern(g + 20 * v)
            rows.append(
                f"({g}, {v}, {bin(wi).count('1')}, "
                f"{wi - (1 << 64) if wi >= 1 << 63 else wi}, "
                f"{wa - (1 << 64) if wa >= 1 << 63 else wa})"
            )
    return ", ".join(rows)


def _profile_oracle() -> str:
    """Closed-form oracle for media_ingest_profile, composed from the proven
    pieces: sniff's feature closed forms (image brightness via the popcount
    LUT, audio rms/duration, video geometry/duration — pattern videos here,
    so 16×16 and ``doc_id % 5 + 2`` frames at 224 + 776/frame bytes) plus the
    signed-pattern fingerprint LUTs (image patterns for image AND video rows
    — the temporal majority recovers the image pattern by design — audio
    patterns for audio rows; NULL for junk)."""
    return f"""
    WITH lut(g, v, k, hi, ha) AS (VALUES {_profile_lut_sql()}),
    d AS (
        SELECT doc_id, doc_id % 20 AS g, least(doc_id // 20, 3) AS v,
               (doc_id // 20) % 8 AS o8, 1 + (doc_id // 20) % 4 AS s,
               doc_id % 4 AS m, doc_id % 5 + 2 AS nfv, text
        FROM documents
    )
    SELECT doc_id,
           CASE m WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  WHEN 2 THEN 'video' ELSE 'unknown' END AS modality,
           CAST(CASE m WHEN 0 THEN 16 WHEN 2 THEN 16 END AS INTEGER) AS width,
           CAST(CASE m WHEN 0 THEN 16 WHEN 2 THEN 16 END AS INTEGER) AS height,
           CAST(CASE m WHEN 0 THEN 3 WHEN 1 THEN 1 WHEN 2 THEN 3 END AS INTEGER) AS channels,
           CASE m WHEN 1 THEN 0.256
                  WHEN 2 THEN floor(nfv / 10.0 * 10000.0 + 0.5) / 10000.0 END AS duration_sec,
           CASE m WHEN 0 THEN floor((40 + o8 * 5 + lut.k * 2.5) * 10000.0 + 0.5) / 10000.0
               END AS brightness,
           CASE m WHEN 1 THEN floor(sqrt(4545000.0) / 32768 * s * 10000.0 + 0.5) / 10000.0
               END AS rms,
           CAST(CASE m WHEN 0 THEN 781 WHEN 1 THEN 4140 WHEN 2 THEN 224 + 776 * nfv
                       ELSE octet_length(encode(coalesce(text, ''))) + 1 END AS BIGINT) AS n_bytes,
           CAST(CASE m WHEN 0 THEN lut.hi WHEN 1 THEN lut.ha WHEN 2 THEN lut.hi
                END AS BIGINT) AS ahash
    FROM d LEFT JOIN lut ON lut.g = d.g AND lut.v = d.v
    """


@register("media_ingest_profile", _profile_oracle())
def q_media_ingest_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-SCAN fused ingest profile over the mixed-format lake (r09 verdict
    directive 6): magic-byte dispatch → decode each payload ONCE → sniff
    features AND the modality's perceptual fingerprint in the same
    mapInPandas pass. The oracle pins every feature cell (sniff's closed
    forms) AND every raw 64-bit fingerprint (the signed-pattern LUTs), so a
    defect in the fusion — a second decode path diverging, a dtype slip in
    the nullable ahash column, dispatch order — fails the hash. The corpus
    interleaves images / WAVs / pattern videos / junk by doc_id % 4 like
    media_sniff_features (pattern videos instead of luma videos so the video
    fingerprint is LUT-pinned too)."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    imgs = synth_media.staged(spark, sf_dir, "images").filter(d % 4 == 0)
    wavs = synth_media.staged(spark, sf_dir, "wavs").filter(d % 4 == 1)
    vids = synth_media.staged(spark, sf_dir, "pattern_videos").filter(d % 4 == 2)
    junk = docs.filter(d % 4 == 3).select(
        "doc_id",
        F.encode(
            F.concat(F.lit("#"), F.coalesce(F.col("text"), F.lit(""))), "UTF-8"
        ).alias("payload"),
    )
    corpus = imgs.unionByName(wavs).unionByName(vids).unionByName(junk)
    return multimodal.media_ingest_profile(corpus)
