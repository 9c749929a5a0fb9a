"""Fuzz the deterministic-rounding contract that underpins every oracle
comparison: for the same input doubles, ``det_round`` (Spark expression),
its SQL form in DuckDB, and the numpy/python forms must agree bit-for-bit.
10k seeded-random values per magnitude regime, plus adversarial half-way
values where Spark's own round() is known to diverge from DuckDB's."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from kda_flink_demo_spark.functions import det_round, det_round_np, det_round_sql


def _spark_round(spark, values: list[float], digits: int) -> list[float]:
    df = spark.createDataFrame(pd.DataFrame({"x": values}))
    return [r.y for r in df.select(det_round(F.col("x"), digits).alias("y")).collect()]


def _duck_round(values: list[float], digits: int) -> list[float]:
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": values}))
    sql = det_round_sql("x", digits)
    return [r[0] for r in con.execute(f"SELECT {sql} FROM t").fetchall()]


def test_det_round_agrees_across_engines(spark):
    rng = np.random.RandomState(7)
    values = np.concatenate(
        [
            rng.uniform(-1, 1, 3000),
            rng.uniform(-1e6, 1e6, 3000),
            rng.uniform(0, 1e-4, 2000),
            # adversarial: exact multiples of 5e-5 (the .00005 boundary) where
            # Spark round() and DuckDB round() famously disagree
            np.arange(1, 2001) * 5e-5,
        ]
    ).tolist()
    for digits in (2, 4, 6):
        s = _spark_round(spark, values, digits)
        d = _duck_round(values, digits)
        n = det_round_np(values, digits).tolist()
        p = [math.floor(v * 10**digits + 0.5) / 10**digits for v in values]
        assert s == d == n == p, f"digits={digits}: engines disagree"


def test_window_assignment_invariants(spark):
    """Every event lands in exactly one tumbling window containing it, and
    exactly size/slide hopping windows."""
    from kda_flink_demo_spark.io.sources import load_table
    from kda_flink_demo_spark.operators.windows import hopping_counts, tumbling_counts
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select(
        F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime")
    )
    n_events = ev.count()
    tumb = tumbling_counts(ev)
    assert tumb.agg(F.sum("railway_class_count")).first()[0] == n_events
    # windows contain their events
    bad = tumb.filter(
        (F.col("window_end") <= F.col("window_start"))
        | (F.col("window_end") - F.col("window_start") != F.expr("INTERVAL 1 MINUTE"))
    )
    assert bad.count() == 0
    # hopping size 2m slide 1m → every event counted exactly twice
    hop = hopping_counts(ev)
    assert hop.agg(F.sum("railway_class_count")).first()[0] == 2 * n_events

def test_window_bucketing_fuzz_vs_python_reference(spark):
    """Seeded-random events INCLUDING exact boundary timestamps: tumbling
    (plain + offset) and hopping window counts must equal a pure-python
    bucketing reference — window start inclusive, end exclusive, offset
    shifting the grid, every slide of a hopping window counted."""
    import datetime as dt
    import random
    from collections import Counter

    from kda_flink_demo_spark.operators.windows import hopping_counts, tumbling_counts

    base = dt.datetime(2024, 3, 1)
    rng = random.Random(777)
    secs = [rng.randrange(0, 600) for _ in range(150)]
    secs += [0, 60, 120, 300, 599, 30, 90]  # exact minute/offset boundaries
    rows = [
        (f"k{rng.randrange(3)}", base + dt.timedelta(seconds=s)) for s in secs
    ]
    df = spark.createDataFrame(rows, "railway_class string, rowtime timestamp")

    def floor_to(ts, size, offset=0):
        e = int((ts - dt.datetime(1970, 1, 1)).total_seconds())
        return dt.datetime(1970, 1, 1) + dt.timedelta(
            seconds=(e - offset) // size * size + offset
        )

    # tumbling 1m, offsets 0 and 30s
    for offset in (0, 30):
        got = {
            (r.railway_class, r.window_start, r.window_end): r.railway_class_count
            for r in tumbling_counts(
                df, offset=None if offset == 0 else f"{offset} seconds"
            ).collect()
        }
        want = Counter()
        for k, ts in rows:
            ws = floor_to(ts, 60, offset)
            want[(k, ws, ws + dt.timedelta(seconds=60))] += 1
        assert got == dict(want), f"offset={offset}"

    # hopping 2m size / 1m slide: each event lands in every window containing it
    got_h = {
        (r.railway_class, r.window_start, r.window_end): r.railway_class_count
        for r in hopping_counts(df).select(
            "railway_class", "railway_class_count", "window_start", "window_end"
        ).collect()
    }
    want_h = Counter()
    for k, ts in rows:
        last_start = floor_to(ts, 60)
        for i in range(2):  # size/slide = 2 windows cover each instant
            ws = last_start - dt.timedelta(seconds=60 * i)
            if ws <= ts < ws + dt.timedelta(seconds=120):
                want_h[(k, ws, ws + dt.timedelta(seconds=120))] += 1
    assert got_h == dict(want_h)


def test_mixing_ops_fuzz_vs_python_reference(spark):
    """Seeded-random corpora (random source alphabets, weights incl. 0 and
    >1 epochs, random sizes incl. 1-doc sources) through source_upsample and
    mix_interleave must equal the pure-python md5 references exactly — the
    sampling-ops twin of the window-bucketing fuzz."""
    import hashlib
    import math
    import random

    from kda_flink_demo_spark.operators.llm import sampling

    rng = random.Random(23)
    space = 2**32
    for trial in range(4):
        n_sources = rng.randrange(1, 7)
        sources = [f"s{j}" for j in range(n_sources)]
        rows = [
            (i, rng.choice(sources)) for i in range(rng.randrange(1, 120))
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string")

        weights = {
            s: rng.choice([0, 30, 60, 100, 130, 250, 999])
            for s in sources
            if rng.random() < 0.7
        }
        expect_up = {}
        for i, s in rows:
            w = weights.get(s, 100)
            u = int(hashlib.md5(f"epochs:{i}".encode()).hexdigest()[:8], 16)
            c = w // 100 + (1 if u < space * (w % 100) // 100 else 0)
            for e in range(c):
                expect_up[(i, e)] = (s, c)
        got_up = {
            (r.doc_id, r.epoch): (r.source, r.n_copies)
            for r in sampling.source_upsample(df, weights).collect()
        }
        assert got_up == expect_up, ("upsample", trial, weights)

        parts = {
            s: rng.randrange(1, 9) for s in sources if rng.random() < 0.7
        }
        lcm = math.lcm(1, *parts.values())

        def hk(i: int) -> int:
            return int(hashlib.md5(f"mix:{i}".encode()).hexdigest()[:15], 16)

        by_src: dict[str, list[int]] = {}
        for i, s in rows:
            by_src.setdefault(s, []).append(i)
        ranks: dict[int, int] = {}
        for s, ids in by_src.items():
            for r, i in enumerate(sorted(ids, key=lambda j: (hk(j), j))):
                ranks[i] = r
        keyed = sorted(
            ((2 * ranks[i] + 1) * (lcm // parts.get(s, 1)), s, i) for i, s in rows
        )
        expect_mix = {i: (ranks[i], p) for p, (_, _, i) in enumerate(keyed)}
        got_mix = {
            r.doc_id: (r.src_rank, r.interleave_pos)
            for r in sampling.mix_interleave(df, parts).collect()
        }
        assert got_mix == expect_mix, ("interleave", trial, parts)
