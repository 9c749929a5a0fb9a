"""Local replica of the driver's DuckDB-oracle comparison: row count + column
names + order-insensitive values. Run at sf0.001 in unit tests for speed; the
driver runs the real thing at sf0.01."""

from __future__ import annotations

import math

import duckdb

from kda_flink_demo_spark.schemas import TESTDATA_TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return repr(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare_to_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    expected = con.execute(sql)
    exp_cols = [d[0] for d in expected.description]
    exp_rows = expected.fetchall()
    got_cols = spark_df.columns
    got_rows = [tuple(r) for r in spark_df.collect()]
    assert sorted(got_cols) == sorted(exp_cols), f"columns differ: {got_cols} vs {exp_cols}"
    assert len(got_rows) == len(exp_rows), f"row counts differ: {len(got_rows)} vs {len(exp_rows)}"
    got_n = _norm_rows(got_cols, got_rows)
    exp_n = _norm_rows(exp_cols, exp_rows)
    if got_n != exp_n:
        diff_g = [r for r in got_n if r not in set(exp_n)][:5]
        diff_e = [r for r in exp_n if r not in set(got_n)][:5]
        raise AssertionError(f"values differ.\n spark-only: {diff_g}\n oracle-only: {diff_e}")
