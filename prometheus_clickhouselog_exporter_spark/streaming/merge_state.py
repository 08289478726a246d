"""Versioned idempotent-merge state for foreachBatch sinks — the
shared recipe under streaming/bitmap_distinct.py and the MinHash sink.

The pattern: aggregate state whose MERGE operator is idempotent and
commutative (bitwise OR, elementwise MIN, ...) can live as versioned
parquet (``state_dir/v{batch_id}``). Each batch reads the newest
version strictly before its own id, merges the batch's partial in,
and overwrites its own version — replaying a failed batch re-reads
the same predecessor and rewrites the same successor, so the sink is
exactly-once WITHOUT a transaction log: idempotence of the merge IS
the commit protocol. (Counter-like state — sums, counts — is NOT
idempotent and needs the epoch-partition ledger of
streaming/medallion.py instead; this module is for sketch-shaped
state.)

100 TB: state size is sketch-bounded (bitmaps by id-space, signatures
by |keys|·|perms|), never stream-length-bounded; each merge shuffles
state rows + one batch's partials on the state key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _fs_and_path(spark: SparkSession, state_dir: str):
    """Hadoop FileSystem handle for state_dir — works for file:, hdfs:,
    s3a:, ... (driver-local os.listdir would silently see nothing on a
    remote scheme and restart state from empty every batch)."""
    jvm = spark.sparkContext._jvm
    path = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, path


def _versions(spark: SparkSession, state_dir: str) -> list[int]:
    fs, path = _fs_and_path(spark, state_dir)
    if not fs.exists(path):
        return []
    out = []
    for status in fs.listStatus(path):
        name = status.getPath().getName()
        if name.startswith("v") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


def latest_state(spark: SparkSession, state_dir: str, before_batch: int):
    """Path of the newest state version with id < before_batch, or None."""
    versions = [v for v in _versions(spark, state_dir) if v < before_batch]
    if not versions:
        return None
    return f"{state_dir}/v{max(versions)}"


def merge_versioned_state(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    fold: Callable[[DataFrame], DataFrame],
    merge: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """fold(batch) → this batch's partial state; merge(partial ∪ prior)
    → new state, written as v{batch_id} and returned (re-read, so the
    caller sees exactly what landed). After a successful write, state
    versions older than the immediate predecessor are PRUNED — the
    predecessor stays so a replay of batch_id still finds its input;
    without retention a continuous stream stores one full state copy
    per batch forever."""
    spark = batch.sparkSession
    ahead = [v for v in _versions(spark, state_dir) if v > batch_id]
    if ahead:
        # State versions newer than this batch mean the checkpoint was
        # reset/deleted while state_dir was kept: silently rebasing from
        # only this batch's partial would write undercounted state while
        # the stale newer versions linger. Fail loud instead.
        raise RuntimeError(
            f"state_dir {state_dir} holds versions {ahead} newer than "
            f"batch {batch_id}: checkpoint/state-dir mismatch — clear "
            "state_dir together with the checkpoint, or restore the "
            "matching checkpoint"
        )
    fresh = fold(batch)
    prev_path = latest_state(spark, state_dir, batch_id)
    if prev_path is not None:
        fresh = merge(fresh.unionByName(spark.read.parquet(prev_path)))
    fresh.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id}")
    fs, _ = _fs_and_path(spark, state_dir)
    jvm = spark.sparkContext._jvm
    for v in _versions(spark, state_dir):
        if v < batch_id - 1:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{state_dir}/v{v}"), True)
    return spark.read.parquet(f"{state_dir}/v{batch_id}")
