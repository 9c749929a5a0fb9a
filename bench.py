"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract: the LAST stdout line is ONE compact JSON object (<1 KB —
round 3's full 89-query map overflowed the driver's ~2 KB tail capture and the
round's bench signal was lost as ``parsed: null``): metric/value/unit/sf,
n_queries, calib_sec, flagship_rows_per_sec, and the 10 slowest queries. The
full per-query map is written to ``bench_full.json`` beside this file.

Each query is forced end-to-end with the noop sink (full computation, no driver
collect). The timer wraps query CONSTRUCTION + execution: some operators
(simhash, clustering) eagerly localCheckpoint an intermediate at construction
time, and that work must not escape the measurement. Since r10 the bench set
is a SUPERSET of the registry (r09 verdict directive 3): dedup_ngram_jaccard
and dedup_simhash_report are benched even though they deliberately pay the
quadratic exact-pairwise oracle baseline — their scale twins
(dedup_minhash_lsh / dedup_simhash) are benched alongside, so the pair reads
as baseline-vs-scale-path, not as a regression. Since r12 the two baselines
run at sf0.01 (`verification_baselines_sf`): their cost is all-pairs fixture
growth by design and re-measuring it at sf0.1 spent ~10 s/round on a known
quadratic (r11 directive 7).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # reference-parity surface
    "tumbling_1m",
    "tumbling_offset_30s",
    "hopping_2m_1m",
    "cumulate_10m_2m",
    "sliding_range_30m",
    "projection_json_cast",
    "ts_parse_fallback",
    "filter_predicates",
    "count_windows_100",
    # relational/agg breadth
    "pricing_summary",
    "distinct_users_per_type",
    "revenue_by_region",
    "top_customers",
    "rank_parts_in_brand",
    "tpch_q3_shipping",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q10_returned_items",
    "tpch_q12_priority_by_linestatus",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_share",
    "tpch_q15_top_supplier",
    "tpch_q16_part_supplier_variety",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_discounted_revenue",
    "tpch_q20_promo_part_suppliers",
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q22_global_sales_opportunity",
    "asof_join_last_purchase",
    "asof_join_next_purchase",
    "range_join_recent_purchases",
    "interval_join_views_purchases",
    "deterministic_sample",
    "session_windows_5m",
    "session_windows_dynamic_gap",
    "analytic_pack",
    "window_frame_pack",
    "stats_aggregate_pack",
    "tumbling_value_stats",
    "embedding_centroids",
    "customers_with_orders",
    "customers_without_orders",
    "nation_set_ops",
    "rollup_nation_region",
    "cube_status_priority",
    "pivot_event_counts",
    "unpivot_part_metrics",
    "listagg_nations_by_region",
    "funnel_conversion",
    "retention_cohorts",
    "percentiles_by_type",
    "skew_salted_agg",
    "grouping_sets_orders",
    "resample_1m_ffill",
    "resample_1m_interp",
    "json_malformed_tolerance",
    "udaf_weighted_avg",
    "approx_distinct_users",
    "value_histogram",
    "merge_changes_cdc",
    "temporal_scd2_join",
    "trend_forecast_by_type",
    "events_interval_dedup",
    "dataset_profile",
    "data_quality_checks",
    "quarantine_gate",
    # function-surface packs (narrow projections — regression canaries)
    "string_function_pack",
    "date_function_pack",
    "math_function_pack",
    "array_function_pack",
    "map_function_pack",
    "hash_function_pack",
    "null_semantics_pack",
    # LLM-pipeline ops (scale paths)
    "dedup_exact",
    "dedup_editdist_pairs",
    "editdist_block_skew_report",
    "editdist_ingest_index_build",
    "ingest_dedup_editdist",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_simhash",
    # deliberate quadratic exact baselines (scale twins directly above) —
    # benched since r10 so bench set ⊇ registry set
    "dedup_ngram_jaccard",
    "dedup_simhash_report",
    "similarity_topk",
    "similarity_ann_lsh",
    "similarity_ivf_topk",
    "pq_index_build",
    "similarity_pq_adc",
    "dedup_embedding_cosine",
    "embedding_kmeans",
    "semantic_dedup",
    "text_tfidf_top_terms",
    "vocab_top_terms",
    "inverted_index",
    "bm25_stats_build",
    "bm25_stats_merge",
    "bm25_retrieval",
    "hybrid_rrf_retrieval",
    "text_language_id",
    "text_quality",
    "text_token_stats",
    "text_normalize",
    "text_pii_redact",
    "text_repetition",
    "text_novelty",
    "text_hashed_features",
    "url_domain_stats",
    "embedding_quantize",
    "embedding_pq",
    "embedding_pca",
    "embedding_pca_check",
    "contamination_check",
    "pack_sequences",
    "chunk_documents",
    "corpus_shuffle_order",
    "dedup_apply_fuzzy",
    "leakage_safe_split",
    "dedup_span_stats",
    "span_dedup_apply",
    "span_decontaminate",
    "bpe_merge_steps",
    "bpe_encode",
    "bpe_encode_stored",
    "length_buckets",
    "temperature_resample",
    "source_upsample",
    "mix_interleave",
    "quality_top_fraction",
    "corpus_filter_pipeline",
    "lm_bigram_score",
    "quality_logreg_score",
    "domain_cap",
    "token_budget_select",
    "ingest_dedup",
    "fuzzy_ingest_index_build",
    "ingest_dedup_fuzzy",
    "ingest_dedup_bloom",
    "corpus_snapshot_diff",
    "multi_resolution_rollup",
    "anomaly_zscore",
    "scd2_user_history",
    "bpe_pair_counts",
    "zorder_layout",
    "incremental_agg_merge",
    "sketch_incremental_pack",
    "quantile_sketch_report",
    "cms_heavy_hitters",
    "corpus_drift_report",
    "shard_assignment",
    "dedup_keep_best",
    "dataset_split",
    "doc_fingerprint",
    "multimodal_decode",
    "multimodal_audio_decode",
    "multimodal_resize",
    "multimodal_frame_sample",
    # perceptual-hash dedup family (round 9: first-class — synth corpus →
    # real decode → hash → quarter-blocked pair join / ingest gate)
    "image_ahash_values",
    "audio_ahash_values",
    "video_ahash_values",
    "image_ahash_index_build",
    "audio_ahash_index_build",
    "image_dedup_report",
    "audio_dedup_report",
    "image_ingest_gate",
    "audio_ingest_gate",
    "video_frame_scores",
    "image_dedup_apply",
    "media_sniff_features",
    "video_dedup_report",
    # round 10: the video standing gate goes driver-visible (BUILD split keeps
    # the gate row at the recurring per-batch cost), and the fused one-scan
    # profile should cost ≈ max, not sum, of sniff + the ahash scans
    "video_ahash_index_build",
    "video_ingest_gate",
    "media_ingest_profile",
    # round 10: PNG — the first compressed container through the real-decode
    # path (stdlib inflate + all five scanline filters, LUT-value-pinned)
    "png_ahash_values",
    "png_sniff_features",
    "wav_width_ahash_values",
    "gif_ahash_values",
    "jpeg_ahash_values",
    "mjpeg_video_ahash_values",
]

# Standing-artifact cost split (operators/llm/standing.py): BUILD rows must
# run before their consumers, else a silent reorder would shift the build
# cost into the consumer's min-of-2 and invert the documented split
# (r06 VERDICT directive 5). bpe_encode_stored is exempt: it cold-builds its
# ON-DISK store transparently and re-loads on the second run.
_BUILD_BEFORE = {
    "dedup_minhash_lsh": ("dedup_clusters", "dedup_apply_fuzzy", "leakage_safe_split"),
    "fuzzy_ingest_index_build": ("ingest_dedup_fuzzy",),
    "pq_index_build": ("similarity_pq_adc",),
    "bpe_merge_steps": ("bpe_encode",),
    "editdist_ingest_index_build": ("ingest_dedup_editdist",),
    "bm25_stats_build": ("bm25_retrieval", "hybrid_rrf_retrieval"),
    "image_ahash_index_build": ("image_ingest_gate",),
    "audio_ahash_index_build": ("audio_ingest_gate",),
    "video_ahash_index_build": ("video_ingest_gate",),
}
for _b, _consumers in _BUILD_BEFORE.items():
    for _c in _consumers:
        assert BENCH_QUERIES.index(_b) < BENCH_QUERIES.index(_c), (
            f"bench ordering: build query {_b} must precede consumer {_c}"
        )

# Deliberate quadratic exact baselines (r10 VERDICT directive 6): they exist
# to VERIFY their scale twins (dedup_minhash_lsh / dedup_simhash), pay the
# all-pairs cost by design, and grow with fixture size — so they are benched
# but reported in a separate `verification_baselines` bucket and EXCLUDED from
# the headline total, which must track scale-path queries only.
VERIFICATION_BASELINES = {"dedup_ngram_jaccard", "dedup_simhash_report"}


def run_calibration(spark) -> float | None:
    """The ONE machine-speed calibration workload (a fixed grouped aggregate
    over 200M generated rows, noop sink), shared by the cold t=0 sample, the
    warm end-of-run sample, and scripts/cc_probe.py — cross-round and
    cold-vs-warm comparability require the workload to stay byte-identical,
    so it lives in exactly one place. Returns seconds, or None on failure
    (calibration must never kill a bench)."""
    try:
        t0 = time.time()
        spark.range(200_000_000).selectExpr("id % 1000 AS k", "id AS v").groupBy(
            "k"
        ).agg({"v": "sum"}).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)
    except Exception:  # noqa: BLE001
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    from kda_flink_demo_spark import registry
    from kda_flink_demo_spark.session import get_spark

    spark = get_spark("kda-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/session warmup so init cost doesn't land on the first measured query
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # machine-speed calibration: a fixed, data-independent workload (see
    # run_calibration). Host contention inflates all wall clocks; dividing
    # query times by (calib_sec / its historical value) separates engine
    # changes from environment noise across rounds. calib_sec is the COLD
    # t=0 sample (kept for cross-round compatibility); the host also
    # throttles under SUSTAINED load, so one t=0 sample cannot see mid-run
    # drift (r11 verdict directive 3) — a WARM calib_series is re-sampled
    # every CALIB_EVERY queries and outlier detection normalizes each query
    # by its NEAREST warm sample, not the run-global one.
    calib_sec = run_calibration(spark)
    calib_series: list[dict] = []

    def sample_calib(at_query: int) -> None:
        s = run_calibration(spark)
        if s is not None:
            calib_series.append({"at_query": at_query, "sec": s})

    CALIB_EVERY = 30
    sample_calib(0)  # warm t=0 anchor (the cold sample above compiled the plan)

    def local_calib(query_index: int) -> float | None:
        best = None
        for s in calib_series:
            if best is None or abs(s["at_query"] - query_index) < abs(
                best["at_query"] - query_index
            ):
                best = s
        return best["sec"] if best else None

    # helpers() = oracle-less library entries (embedding_pca, dedup_simhash)
    # demoted from the driver's queries() surface but still benched
    qs = {**registry.helpers(), **registry.queries()}
    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    query_index: dict[str, int] = {}
    # the two quadratic verification baselines run at sf0.01 (see below), so
    # the main sf0.1 loop skips them — their cost is fixture-size-driven by
    # design and was ~10 s of every round's wall clock (r11 directive 7)
    main_queries = [n for n in BENCH_QUERIES if n not in VERIFICATION_BASELINES]
    for i, name in enumerate(main_queries):
        # uniform min-of-2 for every query (first run pays codegen/python-worker
        # spin-up) — r04's conditional third run for the >2 s tail biased the
        # headline total downward vs earlier rounds; uniform count keeps
        # cross-round totals comparable. Per-query fault isolation: one broken
        # query costs one row, never the round (r04's sliding exception killed
        # the whole bench and left no numbers).
        if i and i % CALIB_EVERY == 0:
            sample_calib(i)
        query_index[name] = i
        best = None
        try:
            for _ in range(2):
                # timer includes construction: eager checkpoints must be measured
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                elapsed = time.time() - t0
                best = elapsed if best is None else min(best, elapsed)
            times[name] = round(best, 3)
        except Exception as e:  # noqa: BLE001 — record and keep benching
            errs[name] = f"{type(e).__name__}: {e}"[:300]

    # Quadratic verification baselines: still benched EVERY round (the bucket
    # stays in the schema) but at sf0.01 — they exist to verify their scale
    # twins, their cost is all-pairs fixture growth, and sf0.1 re-measurement
    # added ~10 s/round of known-quadratic signal. The recorded sf makes the
    # numbers self-describing; cross-round comparison is valid within equal
    # verification_baselines_sf only.
    sib = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    baselines_dir = sib if os.path.isdir(sib) else sf_dir
    baseline_times: dict[str, float] = {}
    for name in VERIFICATION_BASELINES:
        best = None
        try:
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, baselines_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                elapsed = time.time() - t0
                best = elapsed if best is None else min(best, elapsed)
            baseline_times[name] = round(best, 3)
        except Exception as e:  # noqa: BLE001
            errs[name] = f"{type(e).__name__}: {e}"[:300]
    # a custom --data path need not end in 'sf<number>' — never let the
    # label parse throw away a completed run (r12 advice)
    try:
        baselines_sf = float(baselines_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        try:
            baselines_sf = float(sf)
        except ValueError:
            baselines_sf = None

    # end-of-run WARM sample joins the series: warm-vs-warm across rounds
    # exposes sustained host drift a cold t=0 sample misses (r11 saw three
    # same-code runs span 133.0→147.4 while the cold calib claimed the
    # slowest run was the fastest host)
    sample_calib(len(main_queries))
    calib_end_warm = calib_series[-1]["sec"] if calib_series else None

    # Outlier re-runs (r08 verdict #2, widened by r09 directive 4 + advice,
    # localized by r11 directive 3): BENCH_r08 shipped transient
    # host-contention spikes as engine numbers; r11's single t=0 calib then
    # missed MID-RUN throttling and flagged late-run rows as false-positive
    # outliers. Against the PREVIOUS committed bench_full.json, any query now
    # >1.5× its prior time IN MACHINE-NORMALIZED TERMS gets ONE later re-run
    # recorded separately in `outlier_rerun` — where the normalization is by
    # the query's NEAREST warm calib sample over the prior run's warm
    # reference, so a host that slows down halfway through the run rescales
    # the late rows' thresholds instead of flagging them. The headline
    # min-of-2 methodology is unchanged; no >1.5× normalized jump ships
    # unexplained. Re-runs are capped at the 8 worst ratios so a globally-
    # contended round can't double the bench.
    outlier_rerun: dict[str, dict[str, float]] = {}
    prior_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.json")

    def _median(xs: list[float]) -> float | None:
        xs = sorted(xs)
        return xs[len(xs) // 2] if xs else None

    try:
        with open(prior_path) as f:
            prior = json.load(f)
        prior_times = dict(prior.get("queries", {}))
        # prior warm reference: median of its calib_series when present
        # (schema >= 3), else the old single cold calib_sec — one transition
        # round of slightly-off normalization, self-correcting next round
        prior_ref = (
            _median([s["sec"] for s in prior.get("calib_series", [])])
            or prior.get("calib_sec")
        )
        cur_ref = _median([s["sec"] for s in calib_series])
        calib_comparable = (
            cur_ref is not None
            and prior_ref
            and abs(cur_ref - prior_ref) / prior_ref <= 0.15
        )
    except (OSError, ValueError):
        prior_times, prior_ref, calib_comparable = {}, None, False
    if calib_comparable:
        def norm_scale(name: str) -> float:
            lc = local_calib(query_index.get(name, 0))
            return (lc / prior_ref) if lc else 1.0

        flagged = sorted(
            (
                (t / (prior_times[name] * norm_scale(name)), name, t)
                for name, t in times.items()
                if prior_times.get(name)
                and t > 1.5 * prior_times[name] * norm_scale(name)
                # ignore sub-50ms rows: scheduler jitter dominates them and a
                # "2×" there is noise, not signal
                and max(t, prior_times[name]) >= 0.05
            ),
            reverse=True,
        )[:8]
        for ratio, name, t in flagged:
            try:
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                outlier_rerun[name] = {
                    "prior": prior_times[name],
                    "min_of_2": t,
                    "normalized_ratio": round(ratio, 2),
                    "rerun": round(time.time() - t0, 3),
                }
            except Exception:  # noqa: BLE001 — the original row stands
                pass

    total = round(sum(times.values()), 3)

    # flagship throughput: events rows/sec through the tumbling windowed count
    try:
        ev_rows = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        t0 = time.time()
        qs["tumbling_1m"](spark, sf_dir).write.format("noop").mode("overwrite").save()
        flagship_rps = round(ev_rows / max(time.time() - t0, 1e-9))
    except Exception as e:  # noqa: BLE001
        errs["__flagship__"] = f"{type(e).__name__}: {e}"[:300]
        flagship_rps = None

    slowest = dict(sorted(times.items(), key=lambda kv: kv[1], reverse=True)[:10])
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.json")
    # r14 (VERDICT r13 item 2): bench_full.json is overwritten by every run —
    # the driver's low-cpu rerun used to clobber the 32-cpu per-query data, so
    # PERF could never compute a per-query round-over-round comparison. Write
    # a cpu-stamped copy alongside (bench_full_c<cpus>.json): each core count
    # keeps its own latest per-query record, and committed copies give the
    # next round a stable per-query anchor.
    cpus_label = os.environ.get("SPARK_GRAFT_CPUS", "default")
    stamped_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"bench_full_c{cpus_label}.json"
    )
    with open(full_path, "w") as f:
        json.dump(
            {
                # schema 3 (r12): `value` excludes the verification baselines
                # (the r11 split — pre-r11 `value` fields included them, so
                # total-vs-total comparisons across the split must add the
                # baseline bucket back on the pre-r11 side), baselines run at
                # `verification_baselines_sf` (sf0.01 since r12), and
                # `calib_series` records the per-segment warm samples outlier
                # normalization keys on.
                "schema_version": 3,
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "value_excludes_verification_baselines": True,
                "unit": "sec",
                "queries": times,
                "verification_baselines": baseline_times,
                "verification_baselines_sf": baselines_sf,
                "errors": errs,
                "sf": float(sf),
                "flagship_rows_per_sec": flagship_rps,
                "n_queries": len(times),
                "n_verification_baselines": len(baseline_times),
                "n_errors": len(errs),
                "runs_per_query": 2,
                "calib_sec": calib_sec,
                "calib_series": calib_series,
                "calib_end_warm": calib_end_warm,
                "outlier_rerun": outlier_rerun,
            },
            f,
            indent=1,
        )
    import shutil

    try:
        shutil.copyfile(full_path, stamped_path)
    except OSError:
        pass  # the stamped copy is best-effort; never fail a finished run
    # LAST stdout line: compact (<1 KB) so the driver's tail capture parses it
    # (round 3's full 89-query map overflowed the ~2 KB tail capture). The full
    # per-query map + error strings live at the absolute path in "full".
    print(
        json.dumps(
            {
                "schema_version": 3,
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "sf": float(sf),
                "n_queries": len(times),
                "verification_baselines": baseline_times,
                "verification_baselines_sf": baselines_sf,
                "n_errors": len(errs),
                "err_names": sorted(errs)[:5],
                "runs_per_query": 2,
                "calib_sec": calib_sec,
                "calib_series": [s["sec"] for s in calib_series],
                "flagship_rows_per_sec": flagship_rps,
                "slowest": slowest,
                "outlier_rerun": dict(list(outlier_rerun.items())[:4]),
                "full": full_path,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
