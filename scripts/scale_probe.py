"""Scale probe: approximate ~8× sf0.1 (≈ sf0.8, ~4.8M lineitem rows) by
unioning shifted replicas of the sf0.1 tables, then time the flagship queries.
Purpose: demonstrate the plans scale near-linearly (no accidental quadratic
blowups, no driver collects, no OOM) beyond the bench SF.

Run: python scripts/scale_probe.py [replicas]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kda_flink_demo_spark.io.sources import load_table  # noqa: E402
from kda_flink_demo_spark.operators import over_windows, relational, windows  # noqa: E402
from kda_flink_demo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(df, n: int, key_cols: list[str], shift: int = 10_000_000):
    """Union n replicas with shifted keys so joins/groups keep realistic
    cardinality instead of n× duplicate keys."""
    parts = []
    for i in range(n):
        part = df
        for c in key_cols:
            part = part.withColumn(c, F.col(c) + F.lit(i * shift))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # user_id also shifted so the interval-dedup key space scales with the data
    ev_raw = replicate(
        load_table(spark, SF_DIR, "events"), replicas, ["event_id", "user_id"]
    )
    ev = ev_raw.select(
        "event_id", F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
    )
    li = replicate(load_table(spark, SF_DIR, "lineitem"), replicas, ["l_orderkey"])
    orders = replicate(load_table(spark, SF_DIR, "orders"), replicas, ["o_orderkey"])
    customer = load_table(spark, SF_DIR, "customer")
    nation = load_table(spark, SF_DIR, "nation")
    region = load_table(spark, SF_DIR, "region")

    results = {}

    def bench(name, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        results[name] = round(time.time() - t0, 2)

    def bench_lazy(name, fn):
        # for operators with EAGER construction work (per-step localCheckpoints)
        # — the timer must include plan construction, like bench.py's does
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        results[name] = round(time.time() - t0, 2)

    bench("tumbling_count", windows.tumbling_counts(ev))
    from kda_flink_demo_spark.operators.trend import trend_forecast

    bench("trend_forecast", trend_forecast(ev_raw))
    from kda_flink_demo_spark.operators.validation import (
        check_suite,
        column_rule_checks,
        referential_check,
        uniqueness_check,
    )

    bench(
        "data_quality",
        check_suite(
            column_rule_checks(
                orders,
                {
                    "custkey_not_null": F.col("o_custkey").isNotNull(),
                    "price_positive": F.col("o_totalprice") > 0,
                },
            ),
            uniqueness_check(orders, ["o_orderkey"], "orderkey_unique"),
            referential_check(li, orders, "l_orderkey", "o_orderkey", "li_fk"),
        ),
    )
    bench("sliding_range_count", over_windows.sliding_range_count(ev))
    bench(
        "star_join_revenue",
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")),
    )
    bench(
        "top_customers",
        relational.top_customers_by_revenue(customer, orders.withColumn(
            "o_custkey", F.col("o_custkey") % 1500
        )),
    )
    # LLM scale-path operators: replicated docs (shifted ids; texts perturbed
    # per replica so dedup candidate counts stay realistic instead of every
    # replica being an exact duplicate of replica 0) and replicated embeddings.
    from kda_flink_demo_spark.operators.llm import dedup as _dedup
    from kda_flink_demo_spark.operators.llm import similarity as _sim

    docs = replicate(load_table(spark, SF_DIR, "documents"), replicas, ["doc_id"])
    docs = docs.withColumn(
        "text", F.concat_ws(" ", F.col("text"), (F.col("doc_id") / 10_000_000).cast("long").cast("string"))
    )
    emb = replicate(load_table(spark, SF_DIR, "embeddings"), replicas, ["vec_id"])

    bench("exact_dedup", _dedup.exact_dedup_stats(docs))
    bench("minhash_lsh", _dedup.minhash_lsh_pairs(docs, threshold=0.8))
    bench("simhash_pairs", _dedup.simhash_pairs(docs))

    # round-13: editdist family + BM25/hybrid retrieval over the replicated
    # corpus (texts perturbed per replica, so blocks and vocabulary scale
    # realistically)
    bench("editdist_pairs", _dedup.editdist_pairs(docs))
    t0_idx = time.time()
    ed_idx = _dedup.build_editdist_ingest_index(docs.filter(F.col("doc_id") % 3 != 1))
    results["editdist_index_build"] = round(time.time() - t0_idx, 2)
    bench(
        "ingest_editdist_probe",
        _dedup.ingest_editdist_gate(
            docs.filter(F.col("doc_id") % 3 == 1), corpus_index=ed_idx
        ),
    )
    from kda_flink_demo_spark.operators.llm import text as _t13

    t0_bm = time.time()
    bm_stats = _t13.bm25_stats_state(docs).localCheckpoint()
    results["bm25_stats_build"] = round(time.time() - t0_bm, 2)
    bench("bm25_retrieval_standing", _t13.bm25_topk(docs, k=20, stats=bm_stats))
    bench(
        "hybrid_rrf",
        _sim.rrf_fuse(
            [
                _t13.bm25_topk(docs, k=20, stats=bm_stats).select(
                    "query_id", "doc_id", "rank"
                ),
                _sim.cosine_topk(emb, query_ids=[1, 2, 3, 4], k=20).select(
                    "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
                ),
            ],
            k=10,
        ),
    )
    bench(
        "embedding_near_dup",
        _sim.embedding_near_dup_pairs(emb, block_col="label", threshold=0.35),
    )
    bench("cosine_topk", _sim.cosine_topk(emb, query_ids=[0, 1, 2, 3, 4], k=5))
    from kda_flink_demo_spark.operators.llm import packing as _packing

    bench(
        "contamination",
        _dedup.contamination_pairs(
            docs.filter(F.col("doc_id") % 10 != 0),
            docs.filter(F.col("doc_id") % 10 == 0),
            join_on_hash=True,  # the scale path: 8-byte broadcast keys
        ),
    )
    bench("pack_sequences", _packing.pack_sequences(docs))
    bench("shuffle_order", _packing.global_shuffle_order(docs))
    from kda_flink_demo_spark.operators.llm import text as _text

    bench("chunk_documents", _text.chunk_documents(docs))
    bench("doc_fingerprint", _text.doc_fingerprint(docs))
    from kda_flink_demo_spark.operators.llm import pipeline as _pipeline
    from kda_flink_demo_spark.operators.llm import sampling as _sampling

    bench("duplicate_spans", _dedup.duplicate_spans(docs))
    bench("span_dedup_apply", _dedup.span_dedup_apply(docs))
    bench(
        "span_decontaminate",
        _dedup.span_decontaminate(
            docs.filter(F.col("doc_id") % 10 != 0), docs.filter(F.col("doc_id") % 10 == 0)
        ),
    )
    # round-7: per-batch span probe against a standing index (index built
    # OUTSIDE the timer — the probe measures the recurring per-batch cost,
    # the build cost is span_index_hashes' one narrow pass)
    _span_idx = _dedup.span_index_hashes(
        docs.filter(F.col("doc_id") % 2 == 0)
    ).localCheckpoint()
    bench(
        "span_dedup_probe",
        _dedup.span_dedup_probe(docs.filter(F.col("doc_id") % 2 == 1), _span_idx),
    )
    from kda_flink_demo_spark.operators.validation import quarantine_split

    _qg, _qb = quarantine_split(
        orders,
        {
            "custkey_not_null": F.col("o_custkey").isNotNull(),
            "price_positive": F.col("o_totalprice") > 0,
            "priority_domain": F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        },
    )
    bench(
        "quarantine_split",
        _qg.select("o_orderkey").unionByName(_qb.select("o_orderkey")),
    )
    bench_lazy("bpe_merge_train", lambda: _text.bpe_merge_train(docs, steps=4))
    bench("filter_pipeline", _pipeline.filter_pipeline(docs))
    bench("temperature_resample", _sampling.temperature_resample(docs, source_col="lang"))
    bench("length_buckets", _text.length_buckets(docs))
    from kda_flink_demo_spark.operators.llm import lm as _lm

    bench("lm_bigram_score", _lm.bigram_lm_score(docs, join_on_hash=True))
    bench("domain_cap", _sampling.domain_cap(docs, cap=10))
    bench("token_budget_select", _sampling.token_budget_select(docs, budget=1 << 20))
    bench(
        "ingest_dedup",
        _dedup.ingest_dedup_against_corpus(
            docs.filter(F.col("doc_id") % 2 == 0), docs.filter(F.col("doc_id") % 2 == 1)
        ),
    )
    bench("shard_assignment", _packing.assign_shards(docs, n_shards=64))
    from kda_flink_demo_spark.operators.llm import kmeans as _kmeans

    bench("embedding_kmeans", _kmeans.kmeans_assign(emb, k=10, iters=3))
    bench("semantic_dedup", _kmeans.semantic_dedup_pairs(emb, k=10, iters=3))
    bench("dedup_keep_best", _dedup.exact_dedup_keep_best(docs))
    bench("dataset_split", _sampling.dataset_split(docs))
    bench(
        "source_upsample",
        _sampling.source_upsample(docs, {"src0": 250, "src1": 130, "src2": 60, "src3": 0}),
    )
    bench("mix_interleave", _sampling.mix_interleave(docs, {"en": 4, "zh": 3, "es": 2}, source_col="lang"))
    bench("quality_top_fraction", _sampling.quality_top_fraction(docs, fraction=(1, 4)))
    bench("vocab_top_terms", _text.vocab_top_terms(docs, k=500))
    bench("inverted_index", _text.inverted_index(docs))
    from kda_flink_demo_spark.operators.event_dedup import interval_dedup as _idedup

    bench("events_interval_dedup", _idedup(ev_raw, interval_sec=86400))
    # fuzzy ingest does eager work (index localCheckpoints) at CONSTRUCTION —
    # time construction + execution together, like pca below
    t0 = time.time()
    _dedup.ingest_dedup_fuzzy(
        docs.filter(F.col("doc_id") % 2 == 0), docs.filter(F.col("doc_id") % 2 == 1)
    ).write.format("noop").mode("overwrite").save()
    results["ingest_dedup_fuzzy"] = round(time.time() - t0, 2)
    from kda_flink_demo_spark.operators.llm import embeddings as _emb
    from kda_flink_demo_spark.operators.windows import session_counts_dynamic_gap as _sessdyn

    # pca does eager work (stats collect + eigh) at CONSTRUCTION — time it all
    t0 = time.time()
    _emb.pca_project(emb, k=8).write.format("noop").mode("overwrite").save()
    results["embedding_pca"] = round(time.time() - t0, 2)
    bench("session_windows_dynamic_gap", _sessdyn(ev_raw))
    from kda_flink_demo_spark.operators.aggregates import multi_resolution_rollup as _mres
    from kda_flink_demo_spark.operators.llm import versioning as _versioning
    from kda_flink_demo_spark.operators.over_windows import anomaly_zscore as _zscore

    # eager localCheckpoints at CONSTRUCTION — time construction + execution
    t0 = time.time()
    _dedup.ingest_dedup_bloom(
        docs.filter(F.col("doc_id") % 2 == 0), docs.filter(F.col("doc_id") % 2 == 1)
    ).write.format("noop").mode("overwrite").save()
    results["ingest_dedup_bloom"] = round(time.time() - t0, 2)
    bench(
        "snapshot_diff",
        _versioning.snapshot_diff(
            docs.filter(F.col("doc_id") % 10 != 3),
            docs.filter(F.col("doc_id") % 10 != 7).withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 10 == 5, F.concat(F.col("text"), F.lit(" [rev2]"))
                ).otherwise(F.col("text")),
            ),
        ),
    )
    bench("multi_resolution_rollup", _mres(ev_raw))
    bench("anomaly_zscore", _zscore(ev_raw))
    from kda_flink_demo_spark.operators.aggregates import agg_state, merge_agg_states
    from kda_flink_demo_spark.operators.sketches import (
        merge_sketch_states,
        sketch_report,
        sketch_state,
    )

    bench(
        "incremental_agg_merge",
        merge_agg_states(
            *[agg_state(ev_raw.filter(F.col("event_id") % 3 == i)) for i in range(3)]
        ),
    )
    bench(
        "sketch_incremental_pack",
        sketch_report(
            merge_sketch_states(
                *[sketch_state(ev_raw.filter(F.col("event_id") % 3 == i)) for i in range(3)]
            )
        ),
    )
    from kda_flink_demo_spark.operators.sketches import quantile_sketch_report

    bench("quantile_sketch_report", quantile_sketch_report(ev_raw))

    from kda_flink_demo_spark.operators.llm.clustering import leakage_safe_split
    from kda_flink_demo_spark.operators.llm.similarity import pq_adc_topk
    from kda_flink_demo_spark.operators.sketches import cms_heavy_hitters_report
    from kda_flink_demo_spark.operators.validation import distribution_drift

    from kda_flink_demo_spark.operators.llm.text import novelty_score as _novelty

    bench(
        "text_novelty",
        _novelty(
            docs.filter(F.col("doc_id") % 5 != 0), docs.filter(F.col("doc_id") % 5 == 0)
        ),
    )
    bench("text_hashed_features", _text.hashed_features(docs))
    # cms report eagerly localCheckpoints its counts table at construction
    bench_lazy("cms_heavy_hitters", lambda: cms_heavy_hitters_report(docs))
    bench(
        "corpus_drift_report",
        distribution_drift(
            docs,
            docs.filter(F.col("lang") != "zh"),
            {"lang": F.col("lang"), "source": F.col("source")},
        ),
    )
    # leakage split at probe scale: a synthetic 1-in-7 cluster table (the
    # split's cost profile — broadcast join + map-side hash — is independent
    # of how the cluster graph was produced; its build is probed separately
    # via dedup_minhash_lsh/dedup_clusters)
    bench(
        "leakage_safe_split",
        leakage_safe_split(
            docs,
            docs.select(
                "doc_id", (F.col("doc_id") % 1000).alias("canonical_id")
            ).filter(F.col("doc_id") % 7 == 0),
        ),
    )
    bench("embedding_pq", _emb.pq_encode(emb))
    bench("similarity_pq_adc", pq_adc_topk(emb, [0, 1, 2, 3, 4], k=5, shortlist=200))

    # TPC-H Q2/Q11 over the partsupp proxy at 8×: same plan as
    # registry_tpch (one lineitem scan → (partkey, suppkey) partial→final;
    # broadcast dims; Q11's global total as a 1-row broadcast)
    from pyspark.sql import Window as _W

    from pyspark.sql.functions import broadcast as _bc

    supplier = load_table(spark, SF_DIR, "supplier")
    part = load_table(spark, SF_DIR, "part")
    ps8 = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum(F.col("l_quantity").cast("long")).alias("ps_availqty"),
    )
    eu8 = supplier.join(
        _bc(
            nation.join(
                _bc(region.filter(F.col("r_name") == "EUROPE")),
                F.col("n_regionkey") == F.col("r_regionkey"),
            ).select("n_nationkey", "n_name")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    parts8 = part.filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_brand", "p_type")
    q2_cand = ps8.join(_bc(parts8), F.col("ps_partkey") == F.col("p_partkey")).join(
        _bc(eu8), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    bench(
        "tpch_q2_min_cost_supplier",
        q2_cand.withColumn("_min", F.min("ps_supplycost").over(_W.partitionBy("p_partkey")))
        .filter(F.col("ps_supplycost") == F.col("_min"))
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100),
    )
    asup8 = supplier.join(
        _bc(
            nation.join(
                _bc(region.filter(F.col("r_name") == "ASIA")),
                F.col("n_regionkey") == F.col("r_regionkey"),
            ).select("n_nationkey")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")

    def _q11():
        v = (
            F.floor(F.col("ps_supplycost") * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
            * F.col("ps_availqty")
        )
        grouped = (
            ps8.join(_bc(asup8), F.col("ps_suppkey") == F.col("s_suppkey"))
            .select("ps_partkey", v.alias("_v"))
            .groupBy("ps_partkey")
            .agg(F.sum("_v").cast("long").alias("value_micro"))
            .localCheckpoint()
        )
        tot = grouped.agg(
            F.sum("value_micro").cast("long").alias("_t"),
            F.count(F.lit(1)).cast("long").alias("_n"),
        )
        return (
            grouped.crossJoin(_bc(tot))
            .filter(
                F.col("value_micro")
                > F.floor(F.lit(2.0) * F.col("_t") / F.col("_n")).cast("long")
            )
            .orderBy(F.col("value_micro").desc(), "ps_partkey")
        )

    bench_lazy("tpch_q11_important_stock", _q11)

    # round-9: perceptual-hash dedup family at 8×. The synth corpus reuses the
    # fixed 20 pattern groups, so the REPLICATED corpus is maximally dup-heavy
    # (every replica of a doc near-dups every other — group sizes 8× the sf0.1
    # ones). That makes all-pairs output quadratic BY CONSTRUCTION (not a plan
    # defect), so the 8×-probed members are the linear-output stages a real
    # pipeline runs at scale: the decode+hash scan and the ingest GATE, whose
    # distinct-hash collapse keeps the blocked joins O(distinct²) — constant
    # here — no matter how many duplicates the corpus piles into one bucket.
    from kda_flink_demo_spark.operators.llm import image_dedup as _imgd
    from kda_flink_demo_spark.operators.llm import multimodal as _mm
    from kda_flink_demo_spark.operators.llm import synth_media as _synth

    media_docs = docs.select("doc_id")
    bench("image_ahash", _imgd.image_ahash(_synth.synth_images(media_docs)))
    bench("audio_ahash", _imgd.audio_ahash(_synth.synth_wavs(media_docs)))
    bench(
        "video_frame_scores_real",
        _mm.sample_video_frames(_synth.synth_videos(media_docs), stride=5, real_decode=True),
    )
    _img_idx = _imgd.image_ahash(
        _synth.synth_images(
            media_docs.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 20 < 10))
        )
    ).localCheckpoint()
    bench_lazy(
        "image_ingest_gate",
        lambda: _imgd.image_dedup_probe(
            _synth.synth_images(media_docs.filter(F.col("doc_id") % 3 == 1)),
            _img_idx,
            max_hamming=5,
        ),
    )

    # round-10: fused one-scan profile + the video gate at 8×. Same linear-
    # output reasoning as the round-9 members: the fused profile is a pure
    # decode-once scan (growth should track the sniff/hash scans), and the
    # video gate rides the identical distinct-hash-collapsed probe machinery.
    profile_corpus = (
        _synth.synth_images(media_docs.filter(F.col("doc_id") % 4 == 0))
        .unionByName(_synth.synth_wavs(media_docs.filter(F.col("doc_id") % 4 == 1)))
        .unionByName(
            _synth.synth_pattern_videos(media_docs.filter(F.col("doc_id") % 4 == 2))
        )
        .unionByName(
            media_docs.filter(F.col("doc_id") % 4 == 3).select(
                "doc_id",
                F.encode(
                    F.concat(F.lit("#junk"), F.col("doc_id").cast("string")), "UTF-8"
                ).alias("payload"),
            )
        )
    )
    bench("media_ingest_profile", _mm.media_ingest_profile(profile_corpus))
    bench("video_ahash", _imgd.video_ahash(_synth.synth_pattern_videos(media_docs)))
    _vid_idx = _imgd.video_ahash(
        _synth.synth_pattern_videos(
            media_docs.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 20 < 10))
        )
    ).localCheckpoint()

    def _vgate():
        incoming = _synth.synth_pattern_videos(media_docs.filter(F.col("doc_id") % 3 == 1))
        return _imgd.image_dedup_probe(
            incoming,
            _vid_idx,
            max_hamming=5,
            batch_hashes=_imgd.video_ahash(incoming).localCheckpoint(),
        )

    bench_lazy("video_ingest_gate", _vgate)

    # round-10: PNG decode at 8× — inflate + unfilter is partition-local
    # per-payload work (no shuffle at all), so growth should be ≈ linear in
    # rows like the other decode scans
    bench("png_ahash_values", _imgd.image_ahash(_synth.synth_pngs(media_docs)))
    bench("gif_ahash_values", _imgd.image_ahash(_synth.synth_gifs(media_docs)))
    bench("jpeg_ahash_values", _imgd.image_ahash(_synth.synth_jpegs(media_docs)))
    bench("wav_width_ahash_values", _imgd.audio_ahash(_synth.synth_wavs_widths(media_docs)))
    bench(
        "mjpeg_video_ahash_values",
        _imgd.video_ahash(_synth.synth_mjpeg_videos(media_docs)),
    )

    # round-11: bounded frame sampling — the FOOTAGE-LENGTH axis. Same doc
    # count as sf0.1 (un-replicated), frames per video × replicas via
    # chunk-tiled cycles (fixture encode stays O(cycle), the decoder sees an
    # ordinary long stream). With the pinned 9-frame sample the per-video
    # decode cost is CONSTANT, so this row must stay ~flat as footage length
    # scales — the r10 verdict's honest cost cap — where the pre-r11
    # all-frames walk was linear in duration.
    base_docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    bench(
        "mjpeg_long_video_ahash",
        _imgd.video_ahash(_synth.synth_mjpeg_videos(base_docs, repeat=replicas)),
    )

    rows = {"events": ev.count(), "lineitem": li.count(), "documents": docs.count(), "embeddings": emb.count()}
    print(json.dumps({"replicas": replicas, "rows": rows, "sec": results}))


if __name__ == "__main__":
    main()
