"""Single-query oracle probe: python scripts/probe_query.py name1,name2 [sf_dir ...]

Runs the named registry queries against their DuckDB oracles under the
driver-style hostile session (non-UTC tz), at each given sf_dir (default
sf0.001 + sf0.01). Results go to /tmp/probe_query.txt AND stdout-after-stop
(Spark's progress bar corrupts interleaved stdout — see verify skill notes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from tests.oracle import compare_to_oracle, duck_connect

    lines = []
    qs, oracles = E.queries(), E.oracle_sql()
    for sf in sf_dirs:
        con = duck_connect(sf)
        for name in names:
            try:
                df = qs[name](spark, sf)
                if name in oracles:
                    compare_to_oracle(df, con, oracles[name])
                    lines.append(f"OK   {sf} {name}")
                else:
                    # no sort: array-typed result columns make sort_values
                    # raise, misreporting a healthy rows-only query as FAIL —
                    # and only the count is read anyway (review finding)
                    lines.append(f"ROWS {sf} {name} rows={df.count()}")
            except Exception as e:  # noqa: BLE001
                lines.append(f"FAIL {sf} {name}: {str(e)[:300]}")
    with open("/tmp/probe_query.txt", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    spark.stop()
    print("\n".join(lines))


if __name__ == "__main__":
    main()
