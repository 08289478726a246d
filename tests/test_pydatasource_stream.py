"""Python STREAMING DataSource: the reference's tail -f (S1) + offset
control (S2, --from-start) + rotation ReOpen (main.go:100-106) as a
first-class Spark streaming source (SimpleDataSourceStreamReader)."""

from __future__ import annotations

import pytest

from prometheus_clickhouselog_exporter_spark.sources.pydatasource import (
    ClickhouseLogStreamDataSource,
    ClickhouseLogTailReader,
)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(ClickhouseLogStreamDataSource)
    return spark


def _start(spark, path, name, from_start=True, ckpt=None):
    stream = (
        spark.readStream.format("clickhouse_log_stream")
        .option("path", str(path))
        .option("from_start", "true" if from_start else "false")
        .load()
    )
    return (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(ckpt))
        .start()
    )


def test_tail_follows_appends_and_holds_partial_lines(registered, tmp_path):
    spark = registered
    log = tmp_path / "server.log"
    log.write_text("line-1\nline-2\n")
    q = _start(spark, log, "tail1", from_start=True, ckpt=tmp_path / "ck1")
    try:
        q.processAllAvailable()
        got = [r.value for r in spark.sql("SELECT value FROM tail1 ORDER BY file_offset").collect()]
        assert got == ["line-1", "line-2"]

        # append: one complete line + one PARTIAL line (no newline yet)
        with open(log, "a") as fh:
            fh.write("line-3\npart")
        q.processAllAvailable()
        got = [r.value for r in spark.sql("SELECT value FROM tail1 ORDER BY file_offset").collect()]
        assert got == ["line-1", "line-2", "line-3"]  # 'part' held back

        # the partial line completes
        with open(log, "a") as fh:
            fh.write("ial-4\n")
        q.processAllAvailable()
        got = [r.value for r in spark.sql("SELECT value FROM tail1 ORDER BY file_offset").collect()]
        assert got[-1] == "partial-4" and len(got) == 4
    finally:
        q.stop()


def test_from_start_false_skips_history(registered, tmp_path):
    spark = registered
    log = tmp_path / "server.log"
    log.write_text("old-1\nold-2\n")
    q = _start(spark, log, "tail2", from_start=False, ckpt=tmp_path / "ck2")
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM tail2").count() == 0
        with open(log, "a") as fh:
            fh.write("new-1\n")
        q.processAllAvailable()
        got = [r.value for r in spark.sql("SELECT value FROM tail2").collect()]
        assert got == ["new-1"]
    finally:
        q.stop()


def test_rotation_reopens_at_zero(registered, tmp_path):
    spark = registered
    log = tmp_path / "server.log"
    log.write_text("a-1\na-2\n")
    q = _start(spark, log, "tail3", from_start=True, ckpt=tmp_path / "ck3")
    try:
        q.processAllAvailable()
        # rotate: truncate + new content shorter than the old offset
        log.write_text("b-1\n")
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT value, rotation FROM tail3 ORDER BY rotation, file_offset"
        ).collect()
        assert [r.value for r in rows] == ["a-1", "a-2", "b-1"]
        assert [r.rotation for r in rows] == [0, 0, 1]
    finally:
        q.stop()


def test_reader_unit_replay_is_deterministic(tmp_path):
    log = tmp_path / "server.log"
    log.write_text("x-1\nx-2\nx-3\n")
    r = ClickhouseLogTailReader({"path": str(log), "from_start": "true"})
    start = r.initialOffset()
    rows, end = r.read(start)
    rows = list(rows)
    assert [v for v, _, _ in rows] == ["x-1", "x-2", "x-3"]
    replay = list(r.readBetweenOffsets(start, end))
    assert replay == rows
    # partial replay of a sub-range
    mid = {"pos": rows[0][1], "rot": 0}
    sub = list(r.readBetweenOffsets(mid, end))
    assert [v for v, _, _ in sub] == ["x-2", "x-3"]


def test_recreated_file_grown_past_old_offset_reopens_at_zero(tmp_path):
    """Rotation by RECREATION (logrotate create mode): new inode at the
    same path, already grown to >= the committed offset before the next
    trigger. The size heuristic alone would silently resume mid-file,
    skipping the new file's head; the inode check (tail ReOpen contract,
    main.go:101) must catch it and replay from byte 0."""
    import os

    log = tmp_path / "server.log"
    log.write_text("old-1\nold-2\n")  # 12 bytes committed
    r = ClickhouseLogTailReader({"path": str(log), "from_start": "true"})
    start = r.initialOffset()
    rows, end = r.read(start)
    assert [v for v, _, _ in list(rows)] == ["old-1", "old-2"]

    # recreate at the same path with MORE bytes than the old offset
    repl = tmp_path / "server.log.new"
    repl.write_text("fresh-line-1\nfresh-line-2\n")  # 26 bytes >= 12
    os.replace(repl, log)

    rows2, end2 = r.read(end)
    rows2 = list(rows2)
    assert [v for v, _, _ in rows2] == ["fresh-line-1", "fresh-line-2"]
    assert all(rot == 1 for _, _, rot in rows2)
    assert end2["rot"] == 1 and end2["pos"] == 26


def test_reader_rejects_archives(tmp_path):
    bad = tmp_path / "server.log.gz"
    bad.write_bytes(b"\x1f\x8b")
    with pytest.raises(Exception):
        ClickhouseLogTailReader({"path": str(bad), "from_start": "true"})
