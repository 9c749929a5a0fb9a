"""Validation for the approximation operators that have no SQL oracle: MinHash
LSH and SimHash against exact n-gram Jaccard, ANN-LSH recall against brute
force."""

from __future__ import annotations

import pytest

from kda_flink_demo_spark.io.sources import load_table
from kda_flink_demo_spark.operators.llm import dedup, similarity
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def test_minhash_lsh_equals_exact_at_high_threshold(documents):
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(documents, threshold=0.8).collect()
    }
    lsh = {(r.doc_a, r.doc_b) for r in dedup.minhash_lsh_pairs(documents, threshold=0.8).collect()}
    assert exact, "fixture should contain planted near-dups"
    # precision is exact (candidates re-verified); recall ~1 at these params
    assert lsh == exact


def test_simhash_finds_planted_near_dups(documents):
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(documents, threshold=0.9).collect()
    }
    sim = {(r.doc_a, r.doc_b) for r in dedup.simhash_pairs(documents, max_hamming=8).collect()}
    assert exact
    found = len(exact & sim) / len(exact)
    assert found >= 0.8, f"simhash recall {found} on near-identical docs"


def test_lsh_ann_recall_vs_brute_force(embeddings):
    qids = [0, 1, 2, 3, 4]
    brute = similarity.cosine_topk(embeddings, qids, k=5).collect()
    ann = similarity.lsh_ann_topk(embeddings, qids, k=5).collect()
    brute_set = {(r.query_id, r.neighbor_id) for r in brute}
    ann_set = {(r.query_id, r.neighbor_id) for r in ann}
    recall = len(brute_set & ann_set) / len(brute_set)
    # deterministic (fixed planes + data): measured 0.72 at sf0.001, 0.56 at sf0.01
    assert recall >= 0.5, f"ANN recall {recall} too low (got {len(ann_set)} pairs)"


def test_ivf_ann_recall_vs_brute_force(embeddings):
    qids = [0, 1, 2, 3, 4]
    brute = {(r.query_id, r.neighbor_id) for r in similarity.cosine_topk(embeddings, qids, k=5).collect()}
    ivf = {(r.query_id, r.neighbor_id) for r in similarity.ivf_ann_topk(embeddings, qids, k=5).collect()}
    recall = len(brute & ivf) / len(brute)
    # near-random embeddings: nprobe=5 of 10 lists scans ~half the corpus;
    # measured 0.4 at sf0.001, 0.76 at sf0.01 (deterministic)
    assert recall >= 0.35, f"IVF recall {recall}"
    assert all(r.rank <= 5 for r in similarity.ivf_ann_topk(embeddings, qids, k=5).collect())


def test_exact_dedup_keep_first(documents):
    kept = dedup.exact_dedup_keep_first(documents)
    assert kept.count() == documents.select("text").distinct().count()
