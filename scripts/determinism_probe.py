"""Determinism probe: run every registry query TWICE at the given SF and
assert the two result sets are identical. This is the strongest external
check available for the rows-only queries (simhash / ann-lsh / ivf /
approx-distinct / pca), whose values the DuckDB oracle can't verify, and a
second line of defense for everything else — the round-5 prefix-sum
boundary-sampling bug manifested precisely as run-to-run nondeterminism at
sf0.1 before it showed up as oracle mismatches.

Run: python scripts/determinism_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from kda_flink_demo_spark import registry
    from kda_flink_demo_spark.session import get_spark

    spark = get_spark("determinism-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # helpers() = the oracle-less library entries (embedding_pca,
    # dedup_simhash) — this probe is their only external value check, so they
    # must stay covered after their demotion from queries()
    qs = {**registry.helpers(), **registry.queries()}
    bad, errs = [], []
    t_start = time.time()
    def canon(df):
        # repr-normalize cells: grouping-set outputs carry NULL group columns,
        # and Python can't sort tuples mixing None with values
        return sorted(tuple(repr(c) for c in r) for r in df.collect())

    for name, fn in qs.items():
        try:
            a = canon(fn(spark, sf_dir))
            b = canon(fn(spark, sf_dir))
            if a != b:
                diff = sum(1 for x, y in zip(a, b) if x != y) + abs(len(a) - len(b))
                bad.append((name, diff))
                print(f"NONDET {name} ({diff} differing rows)")
            else:
                print(f"OK     {name} ({len(a)} rows)")
        except Exception as e:  # noqa: BLE001
            errs.append(name)
            print(f"ERR    {name}: {type(e).__name__}: {str(e)[:150]}")
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_queries": len(qs),
                "nondeterministic": [n for n, _ in bad],
                "errors": errs,
                "wall_sec": round(time.time() - t_start, 1),
            }
        )
    )
    sys.exit(1 if bad or errs else 0)


if __name__ == "__main__":
    main()
