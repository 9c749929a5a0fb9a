"""Quiet-host timing probe for named registry queries (r11 directive 2).

Usage: python scripts/probe_timing.py name1,name2,... [sf_dir]

Runs each named query end-to-end (noop sink, bench.py's timing shape),
min-of-3 after an untimed warmup run, bracketed by bench.run_calibration
samples so the numbers are interpretable against the committed anchors.
BUILD-before ordering is the caller's job: list build rows before their
consumers, exactly like BENCH_QUERIES does. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from bench import run_calibration

    from kda_flink_demo_spark import registry
    from kda_flink_demo_spark.session import get_spark

    spark = get_spark("kda-spark-probe-timing")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    calib_start = run_calibration(spark)
    run_calibration(spark)  # warm sample discarded; next samples are warm-vs-warm

    qs = {**registry.helpers(), **registry.queries()}
    out: dict[str, float] = {}
    for name in names:
        q = qs[name]
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
        best = None
        for _ in range(3):
            t0 = time.time()
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(time.time() - t0, best) if best else time.time() - t0
        out[name] = round(best, 3)
    calib_end = run_calibration(spark)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "calib_start_cold": calib_start,
                "calib_end_warm": calib_end,
                "min_of_3": out,
            }
        )
    )


if __name__ == "__main__":
    main()
