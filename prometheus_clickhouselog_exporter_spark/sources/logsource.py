"""Log text sources — the Spark rendering of the reference's tailing source.

Reference behavior (cited into /root/reference/):
- S1 tail -f with rotation-safe reopen: main.go:100-106 (`tail.TailFile` with
  ``Follow: true, ReOpen: true``).
- S2 offset control: main.go:19, 94-100 (`--from-start` picks whence=0 vs 2).
- S3 pre-flight validation: main.go:29-53 (stat + 261-byte magic-number
  archive sniff; its directory check is a no-op bug we fix here).

Spark mapping: the streaming *file source* over a log **directory** is the
rotation-safe superset of tailing one file — ClickHouse rotates
``clickhouse-server.log`` → ``.log.1``; a directory listing picks up each new
file exactly once, and checkpointed offsets replace manual whence handling
(S2: a fresh checkpoint ≈ --from-start; an existing checkpoint ≈ resume).
At scale, thousands of servers ship logs into a date-partitioned directory
tree and the same code runs unchanged with ``maxFilesPerTrigger`` for
backpressure.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Magic numbers of archive formats the reference rejects via filetype.IsArchive
# (main.go:33-36). We sniff the same prefix length (261 bytes, the filetype
# library's header size) but only for the archive families relevant to logs.
_ARCHIVE_MAGIC = (
    b"\x1f\x8b",  # gzip
    b"BZh",  # bzip2
    b"\xfd7zXZ\x00",  # xz
    b"PK\x03\x04",  # zip
    b"Rar!\x1a\x07",  # rar
    b"7z\xbc\xaf\x27\x1c",  # 7z
    b"\x28\xb5\x2f\xfd",  # zstd
)


class LogSourceError(ValueError):
    pass


def check_log_path(path: str) -> None:
    """Pre-flight validation (reference S3, main.go:29-53).

    Unlike the reference, a directory is accepted (it is the natural Spark
    source unit) — but a *missing* path and an archive file are rejected,
    matching the reference's MustExist + IsArchive intent. The reference's
    directory branch is a latent no-op (main.go:38-41 returns a nil err);
    we deliberately do not reproduce that bug.
    """
    if not os.path.exists(path):
        raise LogSourceError(f"log path does not exist: {path}")
    if os.path.isdir(path):
        return
    with open(path, "rb") as f:
        head = f.read(261)
    if any(head.startswith(m) for m in _ARCHIVE_MAGIC):
        raise LogSourceError(f"log path is an archive, refusing to tail: {path}")


def read_log_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch scan of a log file/directory → one `value: string` column.

    Batch lowering of S1+S2: a full scan is the reference's --from-start.
    """
    check_log_path(path)
    return spark.read.text(path)


def read_log_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming file source over a log directory (S1 with rotation safety).

    Offsets live in the query checkpoint (S2): delete the checkpoint to
    re-read from the start; keep it to resume where the last run stopped.
    """
    check_log_path(path)
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
