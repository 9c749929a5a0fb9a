from kda_flink_demo_spark.io.sources import load_table, register_views  # noqa: F401
