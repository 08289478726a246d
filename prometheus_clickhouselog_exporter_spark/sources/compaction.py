"""Small-file compaction: the table-maintenance pass every long-lived
100 TB dataset needs (streaming sinks and per-epoch appends accrete
KB-sized parquet files; scan throughput then drowns in open/footer
overhead and the driver chokes on listing).

Spark-first shape: size the input from filesystem metadata (no data
scan), pick the output file count from a target file size, and rewrite
with a round-robin ``repartition`` — plus ``maxRecordsPerFile`` as the
row-skew backstop. Reference analog: none (the exporter appends to
Prometheus state); this is the ops half our parquet session sink
(streaming/sink.py) implies.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(path: str) -> int:
    """Filesystem size of a dataset directory (driver-side metadata walk —
    no Spark job)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def plan_file_count(path: str, target_file_bytes: int = 128 << 20) -> int:
    """Output file count that lands compacted files near the target size
    (128 MB default — the HDFS-block-ish sweet spot: large enough to
    amortize footers, small enough to split)."""
    return max(1, -(-dir_bytes(path) // target_file_bytes))


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 << 20,
    max_records_per_file: int | None = None,
) -> int:
    """Rewrite a parquet directory into ~target-sized files; returns the
    planned file count. Round-robin repartition (not coalesce: coalesce
    collapses upstream parallelism into the narrowed stage, so the READ
    would run on n_out tasks too; repartition keeps the scan wide and
    pays one shuffle of the data being rewritten — which a compaction
    job reads entirely anyway).

    100 TB note: compact per partition-directory (date=...) in
    independent jobs, never the whole table in one; this function is the
    per-directory unit of that loop.
    """
    n_out = plan_file_count(in_path, target_file_bytes)
    df: DataFrame = spark.read.parquet(in_path)
    writer = df.repartition(n_out).write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(out_path)
    return n_out
