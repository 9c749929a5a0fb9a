"""CC-variant probe (r10 verdict directive 4): pointer-jumping vs plain
one-hop min-label propagation on the SHALLOW graphs the engine actually runs
at sf0.1 — the image near-dup connectivity edges behind image_dedup_apply
(near-clique components, the common dedup case) — so the r10 switch to
pointer jumping is confirmed not to regress the common case it wasn't aimed
at (its target was the 1.1M-node diameter-10 chain probe, where one-hop
needed 11 rounds / 17.0 s).

Run: python scripts/cc_probe.py [sf_dir]
Prints one JSON line: wall seconds + rounds for each variant (min-of-2), and
the end-to-end image_dedup_apply row time for context.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kda_flink_demo_spark.io.sources import load_table  # noqa: E402
from kda_flink_demo_spark.operators.llm import clustering, image_dedup, synth_media  # noqa: E402
from kda_flink_demo_spark.session import get_spark  # noqa: E402


def one_hop_components(pairs, max_iter: int = 50, stats: dict | None = None):
    """The pre-r10 formulation: min-label propagation WITHOUT the
    label-of-label jump join — one neighbor-min round per iteration, needs
    ~diameter rounds. Kept here (probe-only) as the measured baseline the
    pointer-jump variant is compared against; semantics are identical at the
    fixpoint."""
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select("u").distinct().withColumn("label", F.col("u")).localCheckpoint()
    hinted = (
        (lambda df: df.hint("merge"))
        if clustering._loop_join_big(labels.count())
        else (lambda df: df)
    )
    for it in range(max_iter):
        neighbor_min = (
            edges.join(hinted(labels.withColumnRenamed("u", "v")), "v")
            .groupBy("u")
            .agg(F.min("label").alias("_nmin"))
        )
        new_labels = (
            labels.join(hinted(neighbor_min), "u", "left")
            .select(
                "u",
                F.least("label", "_nmin").alias("label"),
                F.coalesce(F.col("_nmin") < F.col("label"), F.lit(False)).alias("_changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter("_changed").limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            if stats is not None:
                stats["rounds"] = it + 1
            return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))
    raise RuntimeError("one_hop_components did not converge")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("cc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = load_table(spark, sf_dir, "documents")
    edges = image_dedup.image_near_dup_edges(
        synth_media.synth_images(docs), max_hamming=3
    ).localCheckpoint()  # pair graph materialized once: the probe times CC only
    n_edges = edges.count()

    # calibration (bench.py's single shared workload) so cross-run host noise
    # is visible next to the numbers
    from bench import run_calibration

    calib_sec = run_calibration(spark)

    # one untimed warmup so neither variant pays python-worker/codegen
    # spin-up, then ABBA ordering so residual drift cancels
    clustering.connected_components(edges).write.format("noop").mode("overwrite").save()
    variants = {
        "pointer_jump": clustering.connected_components,
        "one_hop": one_hop_components,
    }
    samples: dict[str, list[float]] = {n: [] for n in variants}
    rounds: dict[str, int | None] = {}
    for name in ["pointer_jump", "one_hop", "one_hop", "pointer_jump"]:
        stats: dict = {}
        t0 = time.time()
        variants[name](edges, stats=stats).write.format("noop").mode("overwrite").save()
        samples[name].append(time.time() - t0)
        rounds[name] = stats.get("rounds")
    results: dict[str, dict] = {
        name: {"sec": round(min(ts), 3), "rounds": rounds[name]}
        for name, ts in samples.items()
    }
    results["calib_sec"] = calib_sec

    # sanity: identical components (order-free comparison via checksum)
    a = clustering.connected_components(edges)
    b = one_hop_components(edges)
    chk = lambda df: df.selectExpr(  # noqa: E731
        "sum(hash(node, component)) AS h", "count(*) AS n"
    ).collect()[0]
    ca, cb = chk(a), chk(b)
    results["components_equal"] = bool(ca.h == cb.h and ca.n == cb.n)

    t0 = time.time()
    from kda_flink_demo_spark import registry

    registry.queries()["image_dedup_apply"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    results["image_dedup_apply_end_to_end_sec"] = round(time.time() - t0, 3)
    results["n_edges"] = n_edges
    print(json.dumps(results))


if __name__ == "__main__":
    main()
