"""Streaming throughput bench: replay the sf0.1 events table (≈100k rows) in 10
time-ordered chunks through the streaming jobs into the upsert sink, report
end-to-end rows/sec (including checkpointing and sink writes).

Run: python scripts/bench_streaming.py [n_chunks]   (default 10; fewer chunks =
bigger micro-batches = higher rows/sec, since per-batch fixed cost dominates)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from kda_flink_demo_spark.io.sources import load_table  # noqa: E402
from kda_flink_demo_spark.session import get_spark  # noqa: E402
from kda_flink_demo_spark.streaming import jobs  # noqa: E402
from kda_flink_demo_spark.streaming.upsert import DuckDBUpsertSink  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("railway_class", T.StringType()),
        T.StructField("rowtime", T.TimestampType()),
    ]
)


def main() -> None:
    spark = get_spark("bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="bench-streaming-")

    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", F.col("event_type").alias("railway_class"), F.col("ts").alias("rowtime"))
        .orderBy("rowtime")
    )
    n_rows = ev.count()
    chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    # time-ordered chunk files via ntile bucketing (no driver collect)
    from pyspark.sql import Window

    bucketed = ev.withColumn(
        "chunk", F.ntile(chunks).over(Window.orderBy("rowtime")) - 1
    )
    for i in range(chunks):
        (
            bucketed.filter(F.col("chunk") == i)
            .drop("chunk")
            .coalesce(1)
            .write.parquet(f"{tmp}/replay/chunk={i:02d}")
        )

    results = {}
    for job_name, table, keys, schema_sql in [
        ("StreamJobSqlTumbling", "tumbling", jobs.TUMBLING_SINK_KEYS, jobs.TUMBLING_SINK_SCHEMA),
        ("StreamJobSqlSliding", "sliding", jobs.SLIDING_SINK_KEYS, jobs.SLIDING_SINK_SCHEMA),
    ]:
        stream = (
            spark.readStream.format("parquet")
            .schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .load(tmp + "/replay/chunk=*")
        )
        sink = DuckDBUpsertSink(f"{tmp}/{table}.duckdb", table, keys, schema_sql)
        t0 = time.time()
        q = jobs.run_to_sink(jobs.dispatch(job_name)(stream), sink, f"{tmp}/ckpt_{job_name}")
        q.awaitTermination(600)
        elapsed = time.time() - t0
        _, rows = sink.read_all()
        results[job_name] = {
            "sec": round(elapsed, 2),
            "rows_per_sec": round(n_rows / elapsed),
            "sink_rows": len(rows),
        }
    print(json.dumps({"events_rows": n_rows, "chunks": chunks, "jobs": results}))


if __name__ == "__main__":
    main()
