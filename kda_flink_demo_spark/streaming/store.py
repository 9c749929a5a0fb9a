"""Crash-safe standing-store primitives shared by the streaming
materialized-view folds (sketch store, SCD2 store, snapshot version store).

Contract: a store directory is trusted only when its ``_SUCCESS`` marker
exists — a partial directory is never read. A new state is materialized at
``<store>.next`` first (Spark commits ``_SUCCESS`` last), then the old store
is deleted and ``.next`` is RENAMED into place (a metadata move). A crash
between the delete and the rename is recovered on the next fold by promoting
the complete ``.next``; a crash mid-write of ``.next`` leaves the marker
absent, so the stale ``.next`` is ignored and overwritten while the old
store stays intact. Everything goes through the Hadoop FileSystem API so the
same code runs on local disk, HDFS, or S3A (a driver-local ``os.path`` probe
would silently never find a remote store and reset state every batch). On
filesystems without atomic rename (raw S3) use a transactional table format
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    return hpath(path).getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def is_complete(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` is a committed write (its ``_SUCCESS`` marker exists)."""
    fs, hpath = _fs(spark, path)
    return fs.exists(hpath(path.rstrip("/") + "/_SUCCESS"))


def _swap_in(fs, hpath, store: str, nxt: str) -> None:
    """Delete the old store and rename ``.next`` into place, CHECKING the
    Hadoop boolean results: an ignored failed delete would make the
    subsequent rename nest ``.next`` INSIDE the still-existing store
    directory (Hadoop rename-into-existing-dir semantics) — silent state
    corruption. Raising instead makes the batch fail and replay."""
    if fs.exists(hpath(store)) and not fs.delete(hpath(store), True):
        raise IOError(f"standing store promote: could not delete old store {store}")
    if not fs.rename(hpath(nxt), hpath(store)):
        raise IOError(
            f"standing store promote: rename {nxt} -> {store} failed "
            "(concurrent writer on the same store_path?)"
        )


def recover_standing(spark: SparkSession, store_path: str) -> bool:
    """Promote an interrupted ``.next`` if the store is missing or incomplete.
    Returns True iff a complete store exists afterwards (False = first fold)."""
    store = store_path.rstrip("/")
    nxt = store + ".next"
    fs, hpath = _fs(spark, store)
    if not is_complete(spark, store) and is_complete(spark, nxt):
        _swap_in(fs, hpath, store, nxt)
    return is_complete(spark, store)


def promote(df: DataFrame, store_path: str) -> None:
    """Materialize ``df`` at ``<store>.next``, then delete + rename into place
    (never a second data write of the new state)."""
    spark = df.sparkSession
    store = store_path.rstrip("/")
    nxt = store + ".next"
    fs, hpath = _fs(spark, store)
    df.write.mode("overwrite").parquet(nxt)
    _swap_in(fs, hpath, store, nxt)
