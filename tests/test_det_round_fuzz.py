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