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


def test_clickhouse_ddl_covers_every_session_record_type(spark):
    """Dialect golden: the full session-record schema (every Spark type a
    session row uses — string/bigint/double/boolean/timestamp) plus the
    epoch column maps onto exact ClickHouse DDL: Nullable() wrapping for
    nullable fields, bare types for the ReplacingMergeTree ORDER BY keys,
    (id, _epoch) replace key = foreachBatch replay idempotence."""
    from pyspark.sql.types import LongType, StructField, StructType, _parse_datatype_string

    from prometheus_clickhouselog_exporter_spark.streaming.jdbc import (
        clickhouse_ddl,
        clickhouse_insert,
    )
    from prometheus_clickhouselog_exporter_spark.streaming.session_state import (
        SESSION_OUTPUT_SCHEMA,
    )

    schema = StructType(
        list(_parse_datatype_string(SESSION_OUTPUT_SCHEMA))
        + [StructField("_epoch", LongType(), False)]
    )
    want = """CREATE TABLE IF NOT EXISTS sessions (
  `row_type` Nullable(String),
  `id` String,
  `host` Nullable(String),
  `port` Nullable(Int64),
  `pid` Nullable(Int64),
  `query` Nullable(String),
  `stmt_type` Nullable(String),
  `start_time` Nullable(DateTime64(6)),
  `end_time` Nullable(DateTime64(6)),
  `rows_read` Nullable(Int64),
  `bytes_read` Nullable(Int64),
  `rps` Nullable(Int64),
  `speed` Nullable(Int64),
  `memory` Nullable(Int64),
  `elapsed` Nullable(Float64),
  `error` Nullable(Bool),
  `error_code` Nullable(Int64),
  `error_message` Nullable(String),
  `full_info` Nullable(Bool),
  `err_type` Nullable(String),
  `obs_label` Nullable(String),
  `_epoch` Int64
)
ENGINE = ReplacingMergeTree
ORDER BY (`id`, `_epoch`)"""
    assert clickhouse_ddl(schema, "sessions") == want

    ins = clickhouse_insert(schema, "sessions")
    assert ins.startswith("INSERT INTO sessions (`row_type`, `id`, ")
    assert ins.count("?") == len(schema.fields)


def test_clickhouse_type_mapping_edges():
    from pyspark.sql import types as T

    import pytest as _pytest

    from prometheus_clickhouselog_exporter_spark.streaming.jdbc import clickhouse_type

    assert clickhouse_type(T.DecimalType(18, 2)) == "Decimal(18, 2)"
    assert clickhouse_type(T.ArrayType(T.DoubleType())) == "Array(Float64)"
    assert clickhouse_type(T.DateType(), nullable=True) == "Nullable(Date32)"
    assert clickhouse_type(T.IntegerType()) == "Int32"
    with _pytest.raises(ValueError, match="no ClickHouse mapping"):
        clickhouse_type(T.MapType(T.StringType(), T.StringType()))


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """Replaying an epoch (the at-least-once failure path) must REPLACE
    its partition, not append duplicates; other epochs are untouched."""
    from prometheus_clickhouselog_exporter_spark.streaming.jdbc import (
        epoch_partitioned_parquet_writer,
    )

    path = str(tmp_path / "sessions_out")
    write = epoch_partitioned_parquet_writer(path)
    write(_sessions(spark), epoch_id=7)
    write(_sessions(spark), epoch_id=8)
    write(_sessions(spark), epoch_id=7)  # replay after simulated failure

    back = spark.read.parquet(path)
    per_epoch = {r["_epoch"]: r["n"] for r in
                 back.groupBy("_epoch").agg(F.count(F.lit(1)).alias("n")).collect()}
    base = _sessions(spark).count()
    assert per_epoch == {7: base, 8: base}
