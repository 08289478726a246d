"""Custom Python DataSource (Spark 4 API) for ClickHouse server logs.

``spark.read.format("clickhouse_log")`` — the engine-native way to mount
the reference's input (main.go: tail of clickhouse-server.log) as a
first-class source. What it adds over ``spark.read.text``:

- per-line PROVENANCE: (path, line_no) columns — text/json sources drop
  the line number, which the exporter's error diagnostics want;
- source validation at plan time: archives and missing paths are
  rejected with the same rules as ``logsource.check_log_path`` (the
  reference's -log-path sniff, fixed to actually fail on directories);
- one InputPartition per file: a directory of rotated logs fans out
  across executors without a repartition.

Deliberate scope: this source yields RAW lines. The typed projection
stays in the JVM expression pipeline (``operators/parsing.parse_log_lines``
— 2.25 M lines/s scan-stage regexes); pushing parsing into the Python
reader would drag every line through row-at-a-time Python, the documented
slow path. The Python DataSource API is the right tool for FORMATS Spark
lacks, not for work its expressions already do: reader output is
Arrow-batched back to the JVM, so the overhead here is bounded by raw
line shipping, and everything downstream is whole-stage codegen.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_ARCHIVE_SUFFIXES = (".gz", ".zst", ".bz2", ".xz", ".zip", ".tar")


class LogFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ClickhouseLogDataSource(DataSource):
    """``spark.dataSource.register(ClickhouseLogDataSource)`` then
    ``spark.read.format("clickhouse_log").load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "clickhouse_log"

    def schema(self) -> str:
        return "path string, line_no bigint, value string"

    def reader(self, schema) -> "ClickhouseLogReader":
        return ClickhouseLogReader(self.options)


class ClickhouseLogReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("clickhouse_log: a path is required")
        if any(path.endswith(s) for s in _ARCHIVE_SUFFIXES):
            raise ValueError(
                f"clickhouse_log: archived log {path!r} is not tailable — "
                "decompress it first (reference -log-path contract)"
            )
        if not os.path.exists(path):
            raise ValueError(f"clickhouse_log: path does not exist: {path!r}")
        if os.path.isdir(path):
            self.files = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".log")
            )
            if not self.files:
                raise ValueError(f"clickhouse_log: no .log files under {path!r}")
        else:
            self.files = [path]

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per rotated file — a log directory parallelizes
        # without a shuffle; a single huge file stays one split (tail
        # semantics: lines are order-dependent within a file).
        return [LogFilePartition(p) for p in self.files]

    def read(self, partition: LogFilePartition) -> Iterator[tuple]:
        with open(partition.path, "r", encoding="utf-8", errors="replace") as fh:
            for i, line in enumerate(fh, start=1):
                yield (partition.path, i, line.rstrip("\n"))


class PromTextfileDataSource(DataSource):
    """Python DataSource WRITER for the Prometheus textfile-collector
    exposition format — the reference ecosystem's file-drop metrics
    handoff (node_exporter --collector.textfile reads ``*.prom`` files;
    the exporter's /metrics payload is the same line grammar,
    metrics.go:16-69). ``df.write.format("prom_textfile").save(dir)``
    with rows (name string, labels string, value double) renders
    ``name{labels} value`` lines, one ``part-N.prom`` file per
    partition, plus a manifest on commit.

    This is the WRITE half of the Python DataSource API
    (DataSourceWriter / WriterCommitMessage / commit-abort protocol) —
    the read half is clickhouse_log above. Same scope doctrine: the
    format is line-oriented text Spark has no native sink for; all
    heavy lifting (aggregation to metric rows) stays in the JVM plan,
    and the writer only renders+appends, so Python touches
    snapshot-cardinality rows, never the corpus.
    """

    @classmethod
    def name(cls) -> str:
        return "prom_textfile"

    def schema(self) -> str:
        return "name string, labels string, value double"

    def writer(self, schema, overwrite: bool) -> "PromTextfileWriter":
        return PromTextfileWriter(self.options, overwrite)


class PromFileCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, final_path: str, rows: int):
        self.tmp_path = tmp_path
        self.final_path = final_path
        self.rows = rows


class PromTextfileWriter(DataSourceWriter):
    """Two-phase commit discipline: every task writes to an
    attempt-unique DOTFILE temp name (speculative/retried attempts can
    never interleave into one file, and the textfile collector ignores
    dotfiles), the driver-side commit() renames the winning attempts to
    their final names, and abort() removes temps. Overwrite clears
    pre-existing .prom files at PLANNING time (driver), so a 2-partition
    overwrite of a 4-partition directory cannot leave stale shards for
    the collector to scrape. A per-write token in the final names keeps
    append mode append (a second write never clobbers part-00000 of the
    first)."""

    def __init__(self, options, overwrite: bool):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("prom_textfile: a path is required")
        self.token = uuid.uuid4().hex[:8]
        if overwrite and os.path.isdir(self.path):
            for f in os.listdir(self.path):
                if f.endswith(".prom") or f == "_MANIFEST":
                    os.remove(os.path.join(self.path, f))

    def write(self, iterator) -> PromFileCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid, att = ctx.partitionId(), ctx.taskAttemptId()
        os.makedirs(self.path, exist_ok=True)
        final = os.path.join(self.path, f"part-{self.token}-{pid:05d}.prom")
        tmp = os.path.join(self.path, f".part-{self.token}-{pid:05d}-{att}.tmp")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                labels = f"{{{row.labels}}}" if row.labels else ""
                fh.write(f"{row.name}{labels} {row.value!r}\n")
                n += 1
        return PromFileCommit(tmp, final, n)

    def commit(self, messages) -> None:
        for m in messages:
            os.replace(m.tmp_path, m.final_path)
        manifest = os.path.join(self.path, "_MANIFEST")
        with open(manifest, "w", encoding="utf-8") as fh:
            for m in messages:
                fh.write(f"{os.path.basename(m.final_path)}\t{m.rows}\n")
        # sweep losing-attempt temps of this write (zombie speculative
        # tasks that returned no commit message)
        for f in os.listdir(self.path):
            if f.startswith(f".part-{self.token}-") and f.endswith(".tmp"):
                try:
                    os.remove(os.path.join(self.path, f))
                except OSError:
                    pass

    def abort(self, messages) -> None:
        for f in os.listdir(self.path) if os.path.isdir(self.path) else []:
            if f.startswith(f".part-{self.token}-") and f.endswith(".tmp"):
                try:
                    os.remove(os.path.join(self.path, f))
                except OSError:
                    pass


class ClickhouseLogStreamDataSource(DataSource):
    """``spark.readStream.format("clickhouse_log_stream")`` — the
    reference's CORE abstraction (main.go:100-106: ``tail.TailFile``
    with Follow + ReOpen, offset-controlled by ``--from-start``,
    main.go:19,94-100) as a first-class Spark STREAMING source via the
    Python SimpleDataSourceStreamReader API:

    - offset = byte position of the last COMPLETE line shipped (a
      partial line at EOF is held back until its newline arrives —
      tail semantics, not chunk semantics);
    - ``from_start=true`` replays the existing file (the --from-start
      flag); default starts at the current EOF like ``tail -f``;
    - rotation: when the file shrinks below the committed offset the
      reader reopens at 0 (the ReOpen contract) and emits a
      ``rotations`` bump so downstream can count reopen events
      (A1-adjacent observability);
    - exactly-once within Spark's replay contract: offsets are pure
      byte positions, ``readBetweenOffsets`` re-reads [start, end) for
      recovery, and prefetched-batch caching is the engine's.

    Options: ``path`` (required), ``from_start`` (default false).
    Schema: value string, file_offset bigint, rotation bigint.

    100 TB: one tailer per log file is the reference's own shape; at
    fleet scale you run one stream over a directory via the file
    source — this source exists for the LIVE-tail offset semantics the
    file source cannot express (it only discovers whole new files).
    """

    @classmethod
    def name(cls) -> str:
        return "clickhouse_log_stream"

    def schema(self) -> str:
        return "value string, file_offset bigint, rotation bigint"

    def simpleStreamReader(self, schema) -> "ClickhouseLogTailReader":
        return ClickhouseLogTailReader(self.options)


class ClickhouseLogTailReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("clickhouse_log_stream: 'path' option is required")
        from .logsource import check_log_path

        check_log_path(self.path)
        self.from_start = str(options.get("from_start", "false")).lower() in (
            "1",
            "true",
            "yes",
        )

    # -- offset helpers ----------------------------------------------
    def _size(self) -> int:
        try:
            return os.path.getsize(self.path)
        except OSError:
            return 0

    def _ino(self) -> int:
        """File identity for rotation detection. The reference's tail
        ReOpen contract (main.go:101) detects RECREATION — a new file at
        the same path — by reopening (inode change), not by size: a
        rotated-and-recreated log that grows past the old offset before
        the next trigger would otherwise be silently resumed mid-file.
        0 = file missing / identity unavailable (skip the inode check)."""
        try:
            return os.stat(self.path).st_ino
        except OSError:
            return 0

    def _scan(self, pos: int, limit: int | None = None):
        """Read complete lines from byte ``pos`` (to ``limit`` or EOF);
        returns (rows, next_pos). A trailing fragment without a newline
        is NOT shipped and NOT advanced past."""
        rows = []
        try:
            fh = open(self.path, "rb")
        except OSError:
            return rows, pos
        with fh:
            fh.seek(pos)
            data = fh.read(None if limit is None else max(0, limit - pos))
        end = len(data)
        start = 0
        off = pos
        while True:
            nl = data.find(b"\n", start, end)
            if nl < 0:
                break
            line = data[start:nl].decode("utf-8", errors="replace")
            off = pos + nl + 1
            rows.append((line, off))
            start = nl + 1
        return rows, off

    # -- SimpleDataSourceStreamReader contract ------------------------
    def initialOffset(self) -> dict:
        return {
            "pos": 0 if self.from_start else self._size(),
            "rot": 0,
            "ino": self._ino(),
        }

    def read(self, start: dict):
        pos, rot = start["pos"], start.get("rot", 0)
        ino, prev_ino = self._ino(), start.get("ino", 0)
        if ino and prev_ino and ino != prev_ino:
            # recreated at the same path (logrotate create mode) — reopen
            # at 0 even if the new file already grew past the old offset
            pos, rot = 0, rot + 1
        elif self._size() < pos:  # truncation fallback → reopen at 0
            pos, rot = 0, rot + 1
        rows, new_pos = self._scan(pos)
        out = [(v, o, rot) for (v, o) in rows]
        return iter(out), {"pos": new_pos, "rot": rot, "ino": ino or prev_ino}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay of [start, end): same-rotation replays
        # re-scan the byte range; across a rotation the pre-rotation
        # bytes are gone (the reference loses them too — tail semantics),
        # so replay yields the post-rotation range only.
        if end.get("rot", 0) == start.get("rot", 0):
            rows, _ = self._scan(start["pos"], limit=end["pos"])
            rot = start.get("rot", 0)
        else:
            rows, _ = self._scan(0, limit=end["pos"])
            rot = end.get("rot", 0)
        return iter([(v, o, rot) for (v, o) in rows])

    def commit(self, end: dict) -> None:  # nothing external to clean up
        return
