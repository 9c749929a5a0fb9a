"""Prefix-monoculture skew probe for editdist_pairs (r12 verdict directive 1).

Builds the boilerplate web-scrape worst case — N DISTINCT docs all opening
with the same 32-char template header, bodies of varying length — and
compares, at growing N:

  r12 plan:   prefix-only blocking + unbounded levenshtein (the shape the
              r12 verdict flagged: one prefix block ⇒ O(distinct²) pairs)
  shipped:    (prefix, length-bucket) blocking with the ±1 probe side, the
              deterministic per-block cap, and the threshold-bounded
              levenshtein kernel (llm/dedup.editdist_pairs)

Also asserts PARITY at the size where the cap does not bind: both plans must
emit the identical pair set (the length bucket provably loses no qualifying
pair), and prints editdist_block_stats so the cap's dropped-text count is
visible where it does bind.

Run on a quiet host: python scripts/probe_editdist_skew.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kda_flink_demo_spark.operators.llm.dedup import (  # noqa: E402
    editdist_block_stats,
    editdist_pairs,
)
from kda_flink_demo_spark.session import get_spark  # noqa: E402

TEMPLATE = "shared template header padding!!"  # 32 chars -> ONE prefix block
THRESHOLD = 20


def monoculture(spark, n: int):
    """n distinct docs: the shared 32-char template + an md5-derived body of
    length doc_id % 240 (unique content, ~12 length buckets) + every 50th doc
    gets a near-twin of its predecessor (some qualifying pairs exist)."""
    assert len(TEMPLATE) == 32
    body = F.substring(
        F.repeat(F.md5(F.col("doc_id").cast("string")), 8), 1,
        (F.col("doc_id") % 240).cast("int"),
    )
    twin_body = F.substring(
        F.repeat(F.md5(((F.col("doc_id") - 1).cast("string"))), 8), 1,
        ((F.col("doc_id") - 1) % 240).cast("int"),
    )
    return (
        spark.range(n)
        .withColumnRenamed("id", "doc_id")
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 50 == 1,
                F.concat(F.lit(TEMPLATE), twin_body, F.lit(" v2")),
            )
            .otherwise(F.concat(F.lit(TEMPLATE), body))
            .alias("text"),
        )
        .localCheckpoint()
    )


def r12_prefix_only(docs):
    """The pre-r13 shipped plan, verbatim shape: prefix-only block key,
    unbounded levenshtein."""
    collapsed = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    u = collapsed.select(
        "doc_id", "text", F.substring(F.lower(F.col("text")), 1, 32).alias("_pfx")
    )
    a = u.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("_ta"), "_pfx")
    b = u.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("_tb"), "_pfx")
    dist = F.levenshtein(F.col("_ta"), F.col("_tb"))
    return (
        a.join(b, "_pfx")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", dist.cast("long").alias("edit_distance"))
        .filter((F.col("edit_distance") >= 1) & (F.col("edit_distance") <= THRESHOLD))
    )


def bench(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    spark = get_spark("editdist-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out: dict = {"template_len": len(TEMPLATE), "threshold": THRESHOLD}

    # parity at the no-cap size: identical pair sets
    small = monoculture(spark, 500)
    got_ship = {
        (r["doc_a"], r["doc_b"], r["edit_distance"])
        for r in editdist_pairs(small, threshold=THRESHOLD).collect()
    }
    got_r12 = {
        (r["doc_a"], r["doc_b"], r["edit_distance"])
        for r in r12_prefix_only(small).collect()
    }
    assert got_ship == got_r12, (
        f"parity broke: ship-only={got_ship - got_r12} r12-only={got_r12 - got_ship}"
    )
    out["parity_pairs_500"] = len(got_ship)

    # the r12 baseline's single prefix block lands in ONE shuffle partition
    # (no parallelism) and pays O(distinct²) unbounded levenshteins — 46 s at
    # 500 docs measured in development; past 1k it is unrunnable, which IS
    # the finding
    for n in (250, 500):
        out[f"r12_sec_{n}"] = bench(r12_prefix_only(monoculture(spark, n)))
        print(f"r12 {n}: {out[f'r12_sec_{n}']}", file=sys.stderr)

    for n in (500, 2_000, 8_000, 24_000):
        docs = monoculture(spark, n)
        out[f"shipped_sec_{n}"] = bench(editdist_pairs(docs, threshold=THRESHOLD))
        stats = editdist_block_stats(docs, threshold=THRESHOLD).collect()[0]
        out[f"max_block_{n}"] = stats["max_block"]
        out[f"dropped_texts_{n}"] = stats["dropped_texts"]
        print(f"shipped {n}: {out[f'shipped_sec_{n}']}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
