"""Dump explain("formatted") for named registry queries to plans/<out_dir>/.

Usage: python scripts/dump_one_plan.py name1,name2 suffix [out_dir]
Writes plans/<out_dir>/<name>_<suffix>.txt (out_dir default r13)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    suffix = sys.argv[2]
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "r13"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kda_flink_demo_spark import registry
    from kda_flink_demo_spark.session import get_spark

    spark = get_spark("kda-spark-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**registry.helpers(), **registry.queries()}
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", out_dir)
    os.makedirs(base, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(base, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")


if __name__ == "__main__":
    main()
