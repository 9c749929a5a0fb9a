"""Round-8 regressions: the r07 advice findings (CMS compaction retry with
the same upto after a mid-step-2 crash, drift_between duplicate/overlapping
batch lists, pq_adc_topk geometry derived from a caller-supplied index) plus
the oracle/registry hygiene changes."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _docs(spark, n=150):
    from kda_flink_demo_spark.io.sources import load_table

    return load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < n)


def _emb(spark):
    from kda_flink_demo_spark.io.sources import load_table

    return load_table(spark, SF_DIR, "embeddings")


def _term_stream(docs):
    return docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def _seg_names(store):
    return sorted(d for d in os.listdir(store) if d.startswith("seg="))


# ---------------------------------------------------------------------------
# CMS compaction: retry-with-same-upto and two-committed-cseg recovery
# (r07 advice, medium)
# ---------------------------------------------------------------------------


def _cms_store(spark, tmp_path, n_batches=4):
    from kda_flink_demo_spark.streaming.standing_stores import (
        cms_from_store,
        update_cms_store,
    )

    docs = _docs(spark)
    terms = _term_stream(docs)
    store = str(tmp_path / "cms")
    for bid in range(n_batches):
        update_cms_store(
            terms.filter(F.col("doc_id") % n_batches == bid),
            bid,
            store,
            depth=3,
            width=64,
        )
    return store, _canon(cms_from_store(spark, store))


def _hand_cseg(spark, store, upto):
    """Committed cseg=<upto> exactly as step 1 of the protocol writes it."""
    from kda_flink_demo_spark.streaming.standing_stores import _cseg_dir

    covered = [
        os.path.join(store, d)
        for d in _seg_names(store)
        if int(d.split("=", 1)[1]) <= upto
    ]
    (
        spark.read.parquet(*covered)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    ).write.parquet(_cseg_dir(store, upto))


def test_cms_compaction_retry_same_upto_after_mid_step2_crash(spark, tmp_path):
    """Crash mid step 2 (cseg=2 committed, seg=2 already deleted, seg=0/1
    survive), then RETRY with the SAME upto: the old recovery skipped a
    committed cseg whose id equals upto_batch, so the retry rebuilt a second
    subsumed cseg from the survivors instead of finishing the swap. The fix
    must converge in one call with a bit-exact readout."""
    from kda_flink_demo_spark.streaming.standing_stores import (
        _cseg_dir,
        cms_from_store,
        compact_cms_store,
    )

    store, before = _cms_store(spark, tmp_path)
    _hand_cseg(spark, store, 2)
    shutil.rmtree(os.path.join(store, "seg=2"))  # mid-step-2 crash
    assert _canon(cms_from_store(spark, store)) == before  # shadow read exact

    compact_cms_store(spark, store, upto_batch=2)  # the retry
    assert _canon(cms_from_store(spark, store)) == before
    assert _seg_names(store) == ["seg=2", "seg=3"]
    assert not os.path.exists(_cseg_dir(store, 2))
    assert not os.path.exists(_cseg_dir(store, 1))


def test_cms_compaction_two_committed_csegs_never_double_count(spark, tmp_path):
    """The advice's worst case: two committed csegs coexist (a retry built a
    second, subsumed one and then crashed before its delete+rename). The next
    compact must DELETE the subsumed cseg — renaming both into seg= dirs
    double-counts the lower one's cells."""
    from kda_flink_demo_spark.streaming.standing_stores import (
        _cseg_dir,
        cms_from_store,
        compact_cms_store,
    )

    store, before = _cms_store(spark, tmp_path)
    _hand_cseg(spark, store, 1)  # cseg=1 covers batches 0..1
    _hand_cseg(spark, store, 2)  # cseg=2 covers batches 0..2 (subsumes it)
    for s in ("seg=0", "seg=1", "seg=2"):
        shutil.rmtree(os.path.join(store, s))
    assert _canon(cms_from_store(spark, store)) == before  # highest shadows

    compact_cms_store(spark, store, upto_batch=3)
    assert _canon(cms_from_store(spark, store)) == before
    assert not os.path.exists(_cseg_dir(store, 1))
    assert not os.path.exists(_cseg_dir(store, 2))
    # all cells now live in committed seg= dirs only, no cseg residue
    assert all(n.startswith("seg=") or n == "_SUCCESS" or n.startswith(".")
               for n in os.listdir(store) if not n.startswith("_"))


# ---------------------------------------------------------------------------
# drift_between: duplicate / overlapping batch lists (r07 advice, low)
# ---------------------------------------------------------------------------


def _drift_store(spark, tmp_path):
    from kda_flink_demo_spark.streaming.standing_stores import update_drift_store

    docs = _docs(spark, n=180)
    store = str(tmp_path / "drift")
    dims = {"lang": F.col("lang"), "source": F.col("source")}
    for bid in range(4):
        update_drift_store(docs.filter(F.col("doc_id") % 4 == bid), bid, store, dims)
    return store


def test_drift_between_dedupes_repeated_batch_ids(spark, tmp_path):
    """A batch id repeated within a list must not read its profile twice and
    inflate that side's counts."""
    from kda_flink_demo_spark.streaming.standing_stores import drift_between

    store = _drift_store(spark, tmp_path)
    clean = _canon(drift_between(spark, store, [0, 1], [2, 3]))
    duped = _canon(drift_between(spark, store, [0, 1, 0, 1], [3, 2, 3]))
    assert duped == clean


def test_drift_between_rejects_old_new_overlap(spark, tmp_path):
    from kda_flink_demo_spark.streaming.standing_stores import drift_between

    store = _drift_store(spark, tmp_path)
    with pytest.raises(ValueError, match="both"):
        drift_between(spark, store, [0, 1], [1, 2])


# ---------------------------------------------------------------------------
# pq_adc_topk: geometry derived from a supplied index (r07 advice, low)
# ---------------------------------------------------------------------------


def test_pq_adc_topk_derives_geometry_from_supplied_index(spark):
    """An index built with m=4/subdim=16 passed to a call whose own params
    say m=8/subdim=8 must rank with the INDEX's geometry (identical to the
    matching-parameter call), not silently misalign the (sub, code) join."""
    from kda_flink_demo_spark.operators.llm.similarity import (
        build_pq_index,
        pq_adc_topk,
    )

    emb = _emb(spark)
    idx = build_pq_index(emb, m=4, subdim=16, codebook_k=8)
    want = _canon(
        pq_adc_topk(emb, [0, 1], k=5, m=4, subdim=16, codebook_k=8, index=idx)
    )
    got = _canon(
        pq_adc_topk(emb, [0, 1], k=5, m=8, subdim=8, codebook_k=16, index=idx)
    )
    assert got == want


def test_pq_adc_topk_rejects_empty_codebook(spark):
    from kda_flink_demo_spark.operators.llm.similarity import (
        build_pq_index,
        pq_adc_topk,
    )

    emb = _emb(spark)
    nv, codes, codebook = build_pq_index(emb, m=4, subdim=16, codebook_k=8)
    empty = (nv, codes, codebook.filter(F.lit(False)))
    with pytest.raises(ValueError, match="empty codebook"):
        pq_adc_topk(emb, [0], k=5, index=empty)


# ---------------------------------------------------------------------------
# Registry hygiene: helpers out of the driver surface (r07 verdict #3)
# ---------------------------------------------------------------------------


def test_registry_has_no_oracle_less_queries():
    """Every driver queries() row must carry an oracle — the oracle-less
    library entries (embedding_pca, dedup_simhash) are helpers now, so the
    driver's CORRECTNESS file can never book a permanent no_oracle row."""
    from kda_flink_demo_spark import registry

    qs, os_, hs = registry.queries(), registry.oracle_sql(), registry.helpers()
    assert set(qs) == set(os_)
    assert {"embedding_pca", "dedup_simhash"} <= set(hs)
    assert not (set(hs) & set(qs))
