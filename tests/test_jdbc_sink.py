"""K1 JDBC sink against a REAL database — Derby embedded, which ships in
pyspark's own jars/ (no install needed). Proves the non-fallback branch of
`write_sessions_jdbc`: table auto-create, append semantics, epoch column,
and a read-back equality check. In production the URL changes to
clickhouse-jdbc; the writer code path is identical (main.go:126 is the
reference's unimplemented analog)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.streaming.jdbc import (
    foreach_batch_writer,
    write_sessions_jdbc,
)

DRIVER = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _sessions(spark):
    return spark.createDataFrame(
        [
            ("q-1", "10.0.0.1", 9000, "select", 120, 4096, datetime(2024, 6, 1, 8, 0, 0), 1.5),
            ("q-2", "10.0.0.2", 9001, "insert", None, None, datetime(2024, 6, 1, 8, 0, 5), None),
        ],
        "id string, host string, port int, stmt_type string, rows_read int, "
        "bytes_read int, start_time timestamp, elapsed double",
    )


def test_write_sessions_jdbc_takes_real_jdbc_path(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    df = _sessions(spark)
    took = write_sessions_jdbc(df, url, "sessions", properties=DRIVER)
    assert took == "jdbc"
    back = spark.read.format("jdbc").option("url", url).option("dbtable", "sessions")
    back = back.option("driver", DRIVER["driver"]).load()
    assert back.count() == 2
    a = {tuple(r) for r in df.collect()}
    b = {tuple(r) for r in back.select(*df.columns).collect()}
    assert a == b
    # append, not overwrite
    assert write_sessions_jdbc(df, url, "sessions", properties=DRIVER) == "jdbc"
    assert (
        spark.read.format("jdbc").option("url", url).option("dbtable", "sessions")
        .option("driver", DRIVER["driver"]).load().count()
        == 4
    )


def test_foreach_batch_writer_records_epoch(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/epochdb;create=true"
    write = foreach_batch_writer(url, "sess_epochs", properties=DRIVER)
    write(_sessions(spark), epoch_id=7)
    back = (
        spark.read.format("jdbc").option("url", url).option("dbtable", "sess_epochs")
        .option("driver", DRIVER["driver"]).load()
    )
    assert back.filter(F.col("_epoch") == 7).count() == 2


def test_fallback_branch_still_works(spark, tmp_path):
    out = str(tmp_path / "stage")
    took = write_sessions_jdbc(
        _sessions(spark), "jdbc:derby:/nonexistent/denied", "t", fallback_parquet=out
    )
    assert took == "parquet"
    assert spark.read.parquet(out).count() == 2
