"""Round-13 optimization equivalence pins: every restructure that changed an
operator's internals must produce bit-identical output to the shape it
replaced (the oracle re-checks externally; these tests pin the equivalence
at the operator level, including edge cases the fixtures don't hit)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("opt-r13-tests")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield s


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fused_table_checks_equal_separate_builders(spark):
    """fused_table_checks (one scan) emits exactly the rows the separate
    rule/uniqueness/referential builders emit — counts and verdicts
    bit-identical, including a real FK-orphan and a real duplicate key."""
    from kda_flink_demo_spark.operators.validation import (
        check_suite,
        column_rule_checks,
        fused_table_checks,
        referential_check,
        uniqueness_check,
    )

    child = spark.createDataFrame(
        [
            (1, 10, 5.0),
            (1, 11, -2.0),   # duplicate key k=1 + rule violation
            (2, None, 3.0),  # NULL fk passes FK, fails not_null rule
            (3, 99, 0.0),    # orphan fk + boundary rule value
        ],
        "k int, fk int, v double",
    )
    parent = spark.createDataFrame([(10,), (11,), (12,)], "pk int")
    rules = {
        "fk_not_null": F.col("fk").isNotNull(),
        "v_positive": F.col("v") > 0,
    }
    fused = fused_table_checks(
        child, rules, ["k"], "k_unique", fk=(parent, "fk", "pk", "fk_refs_parent")
    )
    separate = check_suite(
        column_rule_checks(child, rules),
        uniqueness_check(child, ["k"], "k_unique"),
        referential_check(child, parent, "fk", "pk", "fk_refs_parent"),
    )
    assert _rows(fused) == _rows(separate)


def test_fused_table_checks_empty_input_vacuous_pass(spark):
    from kda_flink_demo_spark.operators.validation import fused_table_checks

    empty = spark.createDataFrame([], "k int, fk int, v double")
    parent = spark.createDataFrame([(1,)], "pk int")
    out = {
        r["check_name"]: r
        for r in fused_table_checks(
            empty,
            {"v_pos": F.col("v") > 0},
            ["k"],
            "k_unique",
            fk=(parent, "fk", "pk", "fk_ok"),
        ).collect()
    }
    for name in ("v_pos", "k_unique", "fk_ok"):
        assert out[name]["n_checked"] == 0
        assert out[name]["n_violations"] == 0
        assert out[name]["passed"] is True


def test_cc_init_fold_equals_identity_init(spark):
    """The r13 label initialization (min(u, neighbors) folded into node
    discovery) converges to the same components as the transitive closure,
    on shapes that exercise the init: chains (deep), stars (shallow),
    isolated edges, and a graph whose min node sits mid-chain."""
    from kda_flink_demo_spark.operators.llm.clustering import connected_components

    cases = [
        [(1, 2), (2, 3), (3, 4), (4, 5)],          # chain, min at end
        [(5, 2), (2, 9), (9, 1), (1, 7)],          # chain, min mid
        [(10, 11), (10, 12), (10, 13), (20, 21)],  # star + separate edge
        [(i, i + 1) for i in range(30, 60)],       # longer chain
    ]
    for pairs in cases:
        df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        got = {r["node"]: r["component"] for r in connected_components(df).collect()}
        # union-find ground truth
        parent: dict[int, int] = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        comps: dict[int, int] = {}
        for n in parent:
            comps[n] = min(m for m in parent if find(m) == find(n))
        assert got == comps


def test_bm25_literal_vocab_prune_matches_broadcast_semantics(spark):
    """The map-side literal vocabulary prune keeps every occurrence of a
    matching term (duplicates included) — same tf, same ranking as the
    documented formula on a corpus with repeated and out-of-vocab terms."""
    from kda_flink_demo_spark.operators.llm.text import bm25_topk

    rows = [
        (1, "alpha alpha beta junk"),
        (2, "alpha junk junk junk"),
        (3, "gamma delta"),
        (4, "beta beta beta alpha"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(docs, queries={7: ["alpha", "beta"]}, k=4).collect()
    ranks = {r["doc_id"]: r["rank"] for r in out}
    assert 3 not in ranks
    assert set(ranks) == {1, 2, 4}
    # doc 4 (beta x3 + alpha) and doc 1 (alpha x2 + beta) must both outrank
    # the single-term doc 2
    assert ranks[2] == 3
