"""Avro round-trip (collection-gated on the spark-avro datasource jar —
see conftest.py): the events table written as Avro and read back must be
value-identical, completing the interchange-format family next to the
ORC/CSV/JSON round-trips in test_sources.py."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_events_avro_roundtrip(spark, tmp_path):
    from prometheus_clickhouselog_exporter_spark.sources.tables import (
        read_parquet_nanos_safe,
    )

    src = read_parquet_nanos_safe(spark, f"{SF_DIR}/events.parquet")
    path = str(tmp_path / "events_avro")
    src.write.mode("overwrite").format("avro").save(path)
    back = spark.read.format("avro").load(path)
    assert back.count() == src.count()
    a = src.orderBy("event_id").collect()
    b = back.orderBy("event_id").collect()
    assert a == b


def test_avro_predicate_pushdown_schema(spark, tmp_path):
    from prometheus_clickhouselog_exporter_spark.sources.tables import (
        read_parquet_nanos_safe,
    )

    src = read_parquet_nanos_safe(spark, f"{SF_DIR}/events.parquet")
    path = str(tmp_path / "events_avro2")
    src.write.mode("overwrite").format("avro").save(path)
    got = (
        spark.read.format("avro")
        .load(path)
        .filter(F.col("event_type") == "purchase")
        .select("event_id")
    )
    expect = src.filter(F.col("event_type") == "purchase").select("event_id")
    assert {r.event_id for r in got.collect()} == {
        r.event_id for r in expect.collect()
    }
