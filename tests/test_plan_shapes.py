"""Physical-plan assertions: the optimizations we claim must be visible in
``explain`` output — filters pushed to the parquet scan, dimension joins
broadcast, top-k as TakeOrderedAndProject, aggregates partial→final, no
Python row-at-a-time UDFs in JVM-path operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from kda_flink_demo_spark.io.sources import load_table
from kda_flink_demo_spark.operators import relational
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark):
    ev = load_table(spark, SF_DIR, "events")
    df = ev.filter((F.col("value") > 50) & F.col("event_type").isin("click", "view")).select(
        "event_id", "event_type", "value"
    )
    plan = df.queryExecution_string if hasattr(df, "queryExecution_string") else _plan(df)
    assert "PushedFilters: [" in plan and "GreaterThan(value,50.0)" in plan, plan
    # column pruning: the scan must not read ts/props/user_id
    read_schema = [line for line in plan.splitlines() if "ReadSchema" in line][0]
    assert "props" not in read_schema and "user_id" not in read_schema


def test_dimension_joins_are_broadcast(spark):
    t = lambda n: load_table(spark, SF_DIR, n)  # noqa: E731
    df = relational.revenue_by_region(t("lineitem"), t("orders"), t("customer"), t("nation"), t("region"))
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan  # customer, nation, region dims


def test_topk_is_take_ordered(spark):
    df = relational.top_customers_by_revenue(
        load_table(spark, SF_DIR, "customer"), load_table(spark, SF_DIR, "orders")
    )
    assert "TakeOrderedAndProject" in _plan(df)


def test_grouped_agg_is_partial_final(spark):
    from kda_flink_demo_spark.operators.aggregates import pricing_summary

    plan = _plan(pricing_summary(load_table(spark, SF_DIR, "lineitem")))
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_jvm_operators_have_no_python_udf(spark):
    """Windows, text analysis, jaccard dedup, cosine topk: all pure JVM plans."""
    from kda_flink_demo_spark.operators.llm import dedup, similarity, text
    from kda_flink_demo_spark.operators.windows import tumbling_counts

    ev = load_table(spark, SF_DIR, "events").select(
        F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
    )
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    for df in [
        tumbling_counts(ev),
        text.quality_score(docs),
        text.doc_fingerprint(docs),
        dedup.ngram_jaccard_pairs(docs),
        dedup.minhash_lsh_pairs(docs),
        similarity.cosine_topk(emb, [0, 1], k=3),
    ]:
        plan = _plan(df)
        assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF in hot path"
        assert "PythonUDF" not in plan or "ArrowEvalPython" in plan


def test_embedding_near_dup_is_single_shuffle_pandas(spark):
    """The blocked cosine matmul must be ONE hash shuffle on the block key into
    one grouped-pandas stage — no pair-row join, no second exchange."""
    from kda_flink_demo_spark.operators.llm import similarity

    emb = load_table(spark, SF_DIR, "embeddings")
    plan = _plan(similarity.embedding_near_dup_pairs(emb, block_col="label", threshold=0.35))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "Join" not in plan, plan


def test_range_join_is_equi_join_on_key(spark):
    """The trailing-hour range join must ride an equi-join on user_id (hash or
    sort-merge), never a nested-loop over the inequality."""
    from kda_flink_demo_spark import registry
    import kda_flink_demo_spark.registry_extra  # noqa: F401 — registers

    df = registry.queries()["range_join_recent_purchases"](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan


def test_contamination_broadcasts_eval_side(spark):
    """The eval-set shingle index must broadcast — the corpus (train) side of a
    decontamination sweep never shuffles for the shared-shingle join."""
    from kda_flink_demo_spark.operators.llm import dedup

    docs = load_table(spark, SF_DIR, "documents")
    df = dedup.contamination_pairs(
        docs.filter(F.col("doc_id") % 10 != 0), docs.filter(F.col("doc_id") % 10 == 0)
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan


def test_pack_sequences_no_global_sort_of_data(spark):
    """The packed-stream prefix sum must range-partition and never plan a
    single-partition sort/window over the document table itself (the tiny
    per-partition-totals window is the only SinglePartition exchange)."""
    from kda_flink_demo_spark.operators.llm import packing

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(packing.pack_sequences(docs))
    # the range exchange now lives INSIDE the lineage-pinned checkpoint (the
    # boundary-consistency fix), so the outer plan shows the pinned scan; the
    # range partitioning itself is asserted on the pre-pin phase below
    assert "Scan ExistingRDD" in plan, plan
    # the only SinglePartition exchange feeds the per-partition totals (one
    # row per partition), not the data: it must sit under an aggregate
    assert plan.count("Exchange SinglePartition") <= 1, plan
    pre = _plan(
        packing._ranged_local(
            docs.selectExpr("doc_id", "1 AS _one"), ["doc_id"], "_one"
        )
    )
    assert "REPARTITION_BY_NUM" in pre or "rangepartitioning" in pre, pre
    assert "Exchange SinglePartition" not in pre, pre


def test_partitioned_write_prunes_on_read(spark, tmp_path_factory):
    """write_partitioned → filtered read must plan partition pruning: the scan
    reads only matching directories, never the full table."""
    from kda_flink_demo_spark.io.sinks import write_partitioned

    path = str(tmp_path_factory.mktemp("part") / "events_by_type")
    ev = load_table(spark, SF_DIR, "events")
    write_partitioned(ev, path, "event_type")
    rd = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = _plan(rd)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200], plan
    assert rd.count() == ev.filter(F.col("event_type") == "click").count()


def test_temperature_resample_corpus_side_is_broadcast_join(spark):
    """The corpus must meet the per-source thresholds via a broadcast hash
    join (map-side filter) — a shuffled corpus here would be a 100 TB
    exchange for a handful of threshold rows."""
    from kda_flink_demo_spark.operators.llm.sampling import temperature_resample

    plan = _plan(temperature_resample(load_table(spark, SF_DIR, "documents"), source_col="lang"))
    assert "BroadcastHashJoin" in plan, plan
    # the one non-broadcast exchange family belongs to the tiny threshold
    # build side (per-source counts), never a join of the corpus
    assert "SortMergeJoin" not in plan, plan


def test_duplicate_spans_shuffles_hashed_longs_not_span_text(spark):
    """The span occurrence count must window over xxhash64 longs — exchanging
    span STRINGS would carry the corpus ~span times over the wire."""
    from kda_flink_demo_spark.operators.llm.dedup import duplicate_spans

    plan = _plan(duplicate_spans(load_table(spark, SF_DIR, "documents")))
    assert "xxhash64" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_ingest_dedup_is_anti_join_on_hash(spark):
    from kda_flink_demo_spark.operators.llm.dedup import ingest_dedup_against_corpus

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(ingest_dedup_against_corpus(docs.limit(100), docs))
    assert "LeftAnti" in plan, plan
    assert "xxhash64" in plan, plan


def test_lm_bigram_score_has_partial_final_counts_no_python(spark):
    from kda_flink_demo_spark.operators.llm.lm import bigram_lm_score

    plan = _plan(bigram_lm_score(load_table(spark, SF_DIR, "documents")))
    assert plan.count("HashAggregate") >= 4, plan  # two count tables, partial+final
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_kmeans_assignment_never_shuffles_corpus(spark):
    """Every assignment round must be map-side: each corpus FileScan feeds the
    broadcast cross join directly (no Exchange between scan and join), seeding
    is TakeOrdered, and the only exchanges carry centroid-sized data
    ((cluster,pos) cells, cluster lists, the single collected struct row)."""
    from kda_flink_demo_spark.operators.llm import kmeans

    plan = _plan(kmeans.kmeans_assign(load_table(spark, SF_DIR, "embeddings"), k=10, iters=3))
    assert "TakeOrderedAndProject(limit=10" in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 3  # one per round
    assert "SortMergeJoin" not in plan and "BatchEvalPython" not in plan
    # no corpus-wide exchange: every Exchange is hash(cluster[,pos]) or the
    # SinglePartition fold of k structs — never partitioning on vec_id or a
    # RoundRobin/range repartition of the scan
    for line in plan.splitlines():
        if "Exchange" in line and "BroadcastExchange" not in line:
            assert "hashpartitioning(cluster" in line or "SinglePartition" in line, line


def test_interval_dedup_single_key_shuffle_arrow_not_batch_python(spark):
    """One hash Exchange on the key columns (the groupBy to per-key arrays);
    the chain walk is an Arrow-batched pandas UDF over key rows — never
    row-at-a-time BatchEvalPython — and re-expansion is JVM array ops."""
    from kda_flink_demo_spark.operators.event_dedup import interval_dedup

    plan = _plan(interval_dedup(load_table(spark, SF_DIR, "events"), interval_sec=86400))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan or "EvalPython" in plan  # the vectorized kernel
    shuffles = [
        line for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    ]
    assert len(shuffles) == 1 and "user_id" in shuffles[0] and "event_type" in shuffles[0], shuffles


def test_multimodal_resize_stub_is_pure_jvm_projection(spark):
    """The stub resize path must stay entirely JVM-side (no Python eval of any
    kind) and shuffle nothing — resize bookkeeping at scan speed."""
    from kda_flink_demo_spark.operators.llm import multimodal

    docs = multimodal.attach_binary_payload(load_table(spark, SF_DIR, "documents"))
    plan = _plan(multimodal.resize_images(docs))
    assert "EvalPython" not in plan  # covers Batch- and Arrow- variants
    assert "Exchange" not in plan


def test_no_shrinking_window_frames_in_fixed_operators(spark):
    """Regression pin for the O(n²) WindowExec trap: first/last(ignorenulls)
    over a CurrentRow..UnboundedFollowing frame re-scans the remaining
    partition buffer per row (measured 354 s vs 1.5 s on resample_interp at
    sf0.1). Both operators now use reverse-ordered RUNNING frames — their
    plans must contain no following-bounded window frame at all."""
    from kda_flink_demo_spark.operators.asof import asof_join_forward
    from kda_flink_demo_spark.operators.over_windows import resample_interp

    ev = load_table(spark, SF_DIR, "events")
    left = ev.select("event_id", "user_id", "ts")
    right = ev.select(F.col("user_id"), F.col("ts").alias("rts"), F.col("event_id").alias("rid"))
    for df in (
        resample_interp(ev),
        asof_join_forward(left, right, on="user_id", left_ts="ts", right_ts="rts", payload_cols=["rid"]),
    ):
        plan = df._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "unboundedfollowing" not in plan, plan[:2000]


def test_span_decontaminate_broadcasts_eval_index(spark):
    """The eval span index must broadcast into the semi join — the train
    corpus never shuffles for contamination detection — and the span keys on
    the wire are xxhash64 longs, never span strings."""
    from kda_flink_demo_spark.operators.llm.dedup import span_decontaminate

    docs = load_table(spark, SF_DIR, "documents")
    df = span_decontaminate(
        docs.filter(F.col("doc_id") % 10 != 0), docs.filter(F.col("doc_id") % 10 == 0)
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "xxhash64" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_span_dedup_apply_is_pure_jvm_single_hash_window(spark):
    """Ownership resolution is one window over the hashed span key; the mask
    fold is a JVM higher-order function — no Python anywhere."""
    from kda_flink_demo_spark.operators.llm.dedup import span_dedup_apply

    plan = _plan(span_dedup_apply(load_table(spark, SF_DIR, "documents")))
    assert "xxhash64" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_bpe_encode_merges_reach_fold_by_broadcast(spark):
    """Each learned merge joins the vocabulary fold by broadcast (never a
    driver collect, never a shuffle of the vocab per round)."""
    from kda_flink_demo_spark.operators.llm.text import bpe_encode

    plan = _plan(bpe_encode(load_table(spark, SF_DIR, "documents"), steps=2))
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_data_quality_row_rules_fuse_into_one_scan_per_table(spark):
    """All four orders row rules must evaluate in a single parquet scan with
    map-side partial aggregation — adding a rule adds a column, not a pass."""
    from kda_flink_demo_spark.operators.validation import column_rule_checks

    orders = load_table(spark, SF_DIR, "orders")
    df = column_rule_checks(
        orders,
        {
            "a": F.col("o_custkey").isNotNull(),
            "b": F.col("o_totalprice") > 0,
            "c": F.col("o_orderstatus").isin("O", "F", "P"),
            "d": F.col("o_orderpriority").isin("1-URGENT"),
        },
    )
    plan = _plan(df)
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("HashAggregate") >= 2, plan  # partial + final


def test_quarantine_gate_is_map_side_no_shuffle(spark):
    """The dead-letter split must be one map-side projection per branch —
    no Exchange anywhere in the plan (filters prune from the same scan)."""
    from kda_flink_demo_spark.registry import queries

    plan = _plan(queries()["quarantine_gate"](spark, SF_DIR))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_approx_distinct_report_has_no_expand(spark):
    """exact+approx must ride the deduped (key, value) projection — mixing
    count_distinct with another aggregate in one agg plans an Expand that
    doubles the shuffle (measured 2.5 s vs 1.1 s at sf0.1)."""
    from kda_flink_demo_spark.operators.aggregates import approx_distinct_report

    ev = load_table(spark, SF_DIR, "events")
    plan = _plan(approx_distinct_report(ev, "event_type", "user_id"))
    assert "Expand" not in plan, plan


def test_span_probe_index_side_never_shuffles(spark):
    """The standing span index must reach the probe by broadcast semi joins
    (batch hashes broadcast into the index scan, hits broadcast back) — an
    Exchange on the index side would reshuffle the corpus every micro-batch."""
    from kda_flink_demo_spark.operators.llm.dedup import (
        span_dedup_probe,
        span_index_hashes,
    )

    docs = load_table(spark, SF_DIR, "documents")
    idx = span_index_hashes(docs.filter(F.col("doc_id") % 2 == 0)).localCheckpoint()
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    plan = _plan(span_dedup_probe(batch, idx, span=5))
    # the two index-facing joins are broadcast semi joins (an index-side
    # sort-merge join would shuffle the corpus-sized index every micro-batch)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    # STRUCTURAL guard: the index scan's immediate consumer (the first
    # operator above it at lower tree depth) must be the broadcast LEFT-SEMI
    # join that filters the index to batch-matching hashes — i.e. the
    # corpus-sized index is reduced map-side BEFORE any Exchange can touch
    # it (the hits-distinct shuffle downstream carries only the already-
    # filtered hit set, which is bounded by the batch's hash count)
    def _depth(line: str) -> int:
        for i, ch in enumerate(line):
            if ch.isalpha():
                return i
        return len(line)

    lines = plan.splitlines()
    scan_i = next(
        i for i, line in enumerate(lines) if "Scan ExistingRDD" in line
    )
    parent = next(
        lines[j]
        for j in range(scan_i - 1, -1, -1)
        if _depth(lines[j]) < _depth(lines[scan_i])
    )
    assert "BroadcastHashJoin" in parent and "LeftSemi" in parent, (
        f"index scan feeds {parent!r}, not a broadcast semi join:\n{plan}"
    )
    # differential shuffle budget vs the no-index probe: the index path may
    # add only batch-bounded hash Exchanges (batch-hash distinct, hit-set
    # distinct, flagged-position dedupe) — three, never a corpus-sized one
    base_plan = _plan(span_dedup_probe(batch, None, span=5))
    extra = plan.count("Exchange hashpartitioning") - base_plan.count(
        "Exchange hashpartitioning"
    )
    assert extra <= 3, f"index side added {extra} hash Exchanges:\n{plan}"


def test_cms_report_probes_join_broadcast_cells(spark):
    """The heavy-hitter probes must meet the depth×width cell table through a
    BROADCAST join (a shuffle join would exchange the probe side for a
    constant-size build side), and no Python UDF may appear anywhere."""
    from kda_flink_demo_spark.operators.sketches import cms_heavy_hitters_report

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(cms_heavy_hitters_report(docs))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_leakage_split_is_broadcast_join_no_corpus_shuffle(spark):
    """The cluster table joins the corpus by broadcast; the only corpus-side
    work is the map-side hash threshold — no Exchange on the corpus."""
    from kda_flink_demo_spark.operators.llm.clustering import leakage_safe_split

    docs = load_table(spark, SF_DIR, "documents")
    clusters = spark.createDataFrame(
        [(1, 1, 2), (2, 1, 2)], "doc_id long, canonical_id long, cluster_size long"
    )
    plan = _plan(leakage_safe_split(docs, clusters))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # no shuffle at all: split assignment is map-only over the scan
    assert "Exchange hashpartitioning" not in plan, plan


def test_drift_report_aggregates_before_windows(spark):
    """Dimension totals must run over the (dim, bucket) aggregate — the
    window's input partitioning is the tiny profile, never corpus rows; the
    corpus contributes exactly two scans (old + new snapshot)."""
    from kda_flink_demo_spark.operators.validation import distribution_drift

    docs = load_table(spark, SF_DIR, "documents")
    new = docs.filter(F.col("lang") != "zh")
    plan = _plan(distribution_drift(docs, new, {"lang": F.col("lang")}))
    assert plan.count("Scan parquet") == 2, plan
    agg_i = plan.index("HashAggregate")
    win_i = plan.index("Window")
    # executedPlan prints top-down: the Window consumes the aggregate, so it
    # appears ABOVE (before) the final HashAggregate in the dump
    assert win_i < agg_i, plan


def test_novelty_reference_index_is_broadcast(spark):
    """The reference gram index reaches the probe stream by broadcast — the
    probe (corpus) side must not shuffle for the membership mark."""
    from kda_flink_demo_spark.operators.llm.text import novelty_score

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(
        novelty_score(
            docs.filter(F.col("doc_id") % 5 != 0),
            docs.filter(F.col("doc_id") % 5 == 0),
        )
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pq_adc_lut_is_broadcast_onto_codes(spark):
    """The query lookup table (Q·m·k rows) must broadcast onto the code
    table; the codes side aggregates (query, vec) partial→final with no
    sort-merge join anywhere in the ADC path."""
    from kda_flink_demo_spark.operators.llm.similarity import (
        build_pq_index,
        pq_adc_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = build_pq_index(emb)
    plan = _plan(pq_adc_topk(emb, [0, 1, 2], k=5, shortlist=50, index=idx))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_tpch_q21_single_fact_scan_no_expand(spark):
    """Q21's correlation rewrite must scan lineitem/orders ONCE (the window
    rollup rides the per-(order, supplier) aggregate, not a second fact
    subtree) and must not plan an Expand (the dual-countDistinct trap the
    approx_distinct report already removed)."""
    from kda_flink_demo_spark.registry import queries

    plan = _plan(queries()["tpch_q21_suppliers_kept_waiting"](spark, SF_DIR))
    assert "Expand" not in plan, plan
    # lineitem + orders + supplier + nation — each exactly once
    assert plan.count("Scan parquet") == 4, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_tpch_q2_single_lineitem_scan_broadcast_dims(spark):
    """Q2's proxy build must scan lineitem ONCE (the correlated-min rewrite
    rides a per-part window, not a second pass), every dim side must
    broadcast, and the top-100 must be TakeOrdered."""
    from kda_flink_demo_spark import registry

    plan = _plan(registry.queries()["tpch_q2_min_cost_supplier"](spark, SF_DIR))
    assert plan.count("Scan parquet") == 5, plan  # lineitem + 4 dims, once each
    assert plan.count("BroadcastHashJoin") == 4, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan, plan


def test_tpch_q11_global_total_is_one_row_broadcast(spark):
    """Q11's global (total, count) must reach the per-part table as a 1-row
    broadcast cross join over the localCheckpointed aggregate — no second
    lineitem scan (no parquet scan at all downstream of the checkpoint) and
    no single-partition window over the dim-sized table."""
    from kda_flink_demo_spark import registry

    plan = _plan(registry.queries()["tpch_q11_important_stock"](spark, SF_DIR))
    assert "Scan parquet" not in plan, plan  # checkpoint cut the scan lineage
    assert plan.count("Scan ExistingRDD") == 2, plan  # grouped reused twice
    assert "BroadcastNestedLoopJoin" in plan, plan  # the 1-row total
    assert "Window" not in plan, plan  # never a global single-partition window


def test_image_dedup_probe_payload_never_shuffles(spark):
    """The perceptual ingest gate must move 8-byte hashes, never image bytes:
    no Exchange row may carry the payload column, every join is broadcast
    (batch-side hash quarters / drop ids), and no CartesianProduct appears —
    the monoculture defense rides DISTINCT hash values, not doc rows."""
    from kda_flink_demo_spark.operators.llm.image_dedup import (
        image_ahash,
        image_dedup_probe,
    )
    from kda_flink_demo_spark.operators.llm.synth_media import synth_images

    docs = load_table(spark, SF_DIR, "documents")
    incoming = synth_images(docs.filter(F.col("doc_id") % 3 == 1))
    index = image_ahash(synth_images(docs.filter(F.col("doc_id") % 3 == 0)))
    plan = _plan(image_dedup_probe(incoming, index, max_hamming=5))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "payload" not in line, line


def test_hash_near_dup_pairs_blocks_on_distinct_hashes(spark):
    """The pair stage's quarter-blocked self-join runs over DISTINCT hash
    values (HashAggregate(keys=[ahash]) feeds the join) with doc rows joining
    back only at expansion; no CartesianProduct, no Python in the join."""
    from kda_flink_demo_spark.operators.llm.image_dedup import hash_near_dup_pairs

    hashes = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.xxhash64("text").alias("ahash")
    )
    plan = _plan(hash_near_dup_pairs(hashes, max_hamming=5))
    assert "CartesianProduct" not in plan, plan
    assert "ahash" in plan and plan.count("HashAggregate") >= 2, plan
    assert "BatchEvalPython" not in plan, plan


def test_media_ingest_profile_is_one_fused_pass(spark):
    """The fused profile must decode in ONE MapInPandas over the unioned
    corpus — a second Python stage would mean a second decode of the lake —
    with no shuffle after the decode (feature rows flow straight out) and no
    row-at-a-time Python anywhere."""
    from kda_flink_demo_spark.operators.llm.multimodal import media_ingest_profile
    from kda_flink_demo_spark.operators.llm.synth_media import synth_images

    corpus = synth_images(load_table(spark, SF_DIR, "documents"))
    plan = _plan(media_ingest_profile(corpus))
    # exactly two Python stages: the synth source stand-in + the fused kernel
    assert plan.count("MapInPandas") == 2, plan
    assert "BatchEvalPython" not in plan, plan
    fused_at = plan.index("MapInPandas")  # first occurrence = outermost stage
    assert "Exchange" not in plan[:fused_at], plan  # nothing shuffles after it


def test_connected_components_rounds_never_broadcast_big_labels(spark):
    """Past the node threshold the CC per-round joins must be sort-merge
    (spill-safe, executor-side): a per-round broadcast of the node-sized
    label table OOMs the driver once the graph passes fixture scale (r10
    probe at 1.1M nodes), and shuffle-hash's build side cannot spill. Below
    the threshold Catalyst keeps its preferred plan — the broadcast of a
    fixture-sized label table is harmless and fastest."""
    from kda_flink_demo_spark.operators.llm.clustering import _loop_join_big

    assert not _loop_join_big(5_000)  # fixture graphs: planner's choice
    assert _loop_join_big(100_001)  # 10x under the measured 1.1M failure
    assert _loop_join_big(1_100_000)

    # the strategy the big path pins must actually plan as SortMergeJoin
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 4000, 2)], "doc_a long, doc_b long"
    )
    e = edges.selectExpr("doc_a as u", "doc_b as v")
    lab = edges.selectExpr("doc_a as v", "doc_a as label")
    round_plan = _plan(
        e.join(lab.hint("merge"), "v").groupBy("u").agg(F.min("label").alias("m"))
    )
    assert "SortMergeJoin" in round_plan, round_plan
    assert "BroadcastHashJoin" not in round_plan, round_plan


def test_bm25_prunes_postings_before_any_exchange(spark):
    """BM25's corpus side must be pruned to the query vocabulary BEFORE the
    tf aggregate's Exchange — the shuffled volume is query-term postings,
    never the corpus. Since the r13 optimization round the prune is a
    MAP-SIDE literal `filter(tokens, array_contains(vocab, t))` inside the
    projection feeding the explode (the query vocabulary is a plan-time
    constant), so there must be NO join of any kind below the first
    exchange — the old broadcast semi-join's exchange is gone entirely —
    and every scoring join above it stays broadcast."""
    from kda_flink_demo_spark.operators.llm.text import bm25_topk

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(bm25_topk(docs))
    assert "SortMergeJoin" not in plan
    # the plan tree prints parents before children: everything AFTER the
    # Generate's text position is its input subtree (scan side). The prune
    # must sit there as an array_contains filter, and no join may appear
    # below the Generate (the corpus reaches the explode unjoined).
    gen = plan.rindex("Generate explode")
    assert "array_contains" in plan[gen:], plan[gen:][:400]
    assert "Join" not in plan[gen:], plan[gen:][:400]
    # scoring joins above the aggregate are all broadcast
    assert "BroadcastHashJoin" in plan[:gen]

    # the r13 standing-stats path must keep the same shape, and its stats
    # lookup is a literal IN filter (pushable scan predicate), not a join
    from kda_flink_demo_spark.operators.llm.text import bm25_stats_state

    stats = bm25_stats_state(docs).localCheckpoint()
    plan_s = _plan(bm25_topk(docs, stats=stats))
    assert "SortMergeJoin" not in plan_s
    gen_s = plan_s.rindex("Generate explode")
    assert "array_contains" in plan_s[gen_s:]
    assert "Join" not in plan_s[gen_s:]
    assert "BroadcastHashJoin" in plan_s[:gen_s]


def test_bm25_semantics_on_controlled_corpus(spark):
    """Both-term docs outrank single-term docs; a rarer term outweighs a
    common one at equal tf; longer docs are length-penalized."""
    from kda_flink_demo_spark.operators.llm.text import bm25_topk

    rows = [
        (1, "hash join"),              # both terms, short
        (2, "hash join " + "pad " * 40),  # both terms, heavily padded
        (3, "hash only here"),         # one term, short
        (4, "join appears alone"),     # one term, short
        (5, "nothing relevant"),
        (6, "hash hash hash"),         # tf saturation: still one term
        (7, "hash here " + "pad " * 40),  # ONE term at doc 2's length
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(docs, queries={1: ["hash", "join"]}, k=7).collect()
    ranks = {r["doc_id"]: r["rank"] for r in out}
    scores = {r["doc_id"]: r["score"] for r in out}
    assert 5 not in ranks, "no-match docs must not appear"
    assert ranks[1] == 1, "short both-term doc wins"
    assert scores[1] > scores[2] > 0, "length normalization penalizes padding"
    assert scores[2] > scores[7], "two terms beat one at equal length"
    assert scores[6] < scores[1], "tf saturation: repetition beats nothing but not coverage"


def test_bm25_standing_stats_merge_and_score_parity(spark):
    """R13 standing stats: (a) per-slice states merged by merge_bm25_stats
    equal the direct full-corpus state row-for-row; (b) bm25_topk scoring
    against the standing state returns the identical ranking to the live
    corpus-aggregate path."""
    from pyspark.sql import functions as F

    from kda_flink_demo_spark.operators.llm.text import (
        bm25_stats_state,
        bm25_topk,
        merge_bm25_stats,
    )

    docs = load_table(spark, SF_DIR, "documents")
    direct = bm25_stats_state(docs)
    merged = merge_bm25_stats(
        bm25_stats_state(docs.filter(F.col("doc_id") % 2 == 0)),
        bm25_stats_state(docs.filter(F.col("doc_id") % 2 == 1)),
    )
    key = lambda r: (r["term"] or "", r["df"], r["n_docs"], r["dl_sum"])  # noqa: E731
    assert sorted(map(key, direct.collect())) == sorted(map(key, merged.collect()))

    live = bm25_topk(docs).collect()
    standing = bm25_topk(docs, stats=direct.localCheckpoint()).collect()
    row = lambda r: (r["query_id"], r["doc_id"], r["score"], r["rank"])  # noqa: E731
    assert sorted(map(row, live)) == sorted(map(row, standing))
