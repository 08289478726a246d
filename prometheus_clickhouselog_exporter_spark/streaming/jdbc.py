"""ClickHouse/JDBC session sink (K1's production target per BASELINE).

The real JDBC branch is exercised in CI against Derby embedded (ships in
pyspark's own jars/ — tests/test_jdbc_sink.py does a write→read-back
round-trip plus epoch stamping). In a deployment, putting `clickhouse-jdbc`
on the classpath and passing its URL lands batches in ClickHouse directly;
when no driver can reach the URL the writer degrades to a parquet staging
directory with the SAME schema and append semantics (per-epoch append,
idempotent-by-epoch layout identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_sessions_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    fallback_parquet: str | None = None,
    properties: dict[str, str] | None = None,
) -> str:
    """Append session records to a JDBC table; returns 'jdbc' or
    'parquet' for the path taken. Errors only when neither is possible."""
    try:
        writer = df.write.mode("append").format("jdbc").option("url", url).option("dbtable", table)
        for k, v in (properties or {}).items():
            writer = writer.option(k, v)
        writer.save()
        return "jdbc"
    except Exception:
        if not fallback_parquet:
            raise
        df.write.mode("append").parquet(fallback_parquet)
        return "parquet"


def foreach_batch_writer(
    url: str,
    table: str,
    fallback_parquet: str | None = None,
    properties: dict[str, str] | None = None,
):
    """foreachBatch adapter: epoch id is recorded as a column so replays
    of a failed epoch stay identifiable downstream (ClickHouse
    ReplacingMergeTree on (id, epoch) gives exactly-once semantics)."""
    from pyspark.sql import functions as F

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        write_sessions_jdbc(
            batch_df.withColumn("_epoch", F.lit(epoch_id)), url, table, fallback_parquet,
            properties,
        )

    return write
