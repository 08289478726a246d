"""ClickHouse/JDBC session sink (K1's production target per BASELINE).

The real JDBC branch is exercised in CI against Derby embedded (ships in
pyspark's own jars/ — tests/test_jdbc_sink.py does a write→read-back
round-trip plus epoch stamping). In a deployment, putting `clickhouse-jdbc`
on the classpath and passing its URL lands batches in ClickHouse directly;
when no driver can reach the URL the writer degrades to a parquet staging
directory with the SAME schema and append semantics (per-epoch append,
idempotent-by-epoch layout identical).

The ClickHouse DIALECT lives here too (the reference's unimplemented
sink, main.go:126 TODO): ``clickhouse_type``/``clickhouse_ddl`` map every
Spark type a session record uses onto ClickHouse DDL (Nullable() wrapping,
ReplacingMergeTree keyed on (id, _epoch) so foreachBatch epoch replays
merge away — the exactly-once story), and ``clickhouse_insert`` renders
the column-stable INSERT. Asserted against goldens in
tests/test_jdbc_sink.py without a live server.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Spark → ClickHouse type mapping for every type session records and
# metric exports use. Values are the non-nullable CH type; nullable Spark
# fields wrap in Nullable(...) at DDL render time.
_CH_TYPES: dict[type, str] = {
    T.StringType: "String",
    T.LongType: "Int64",
    T.IntegerType: "Int32",
    T.ShortType: "Int16",
    T.ByteType: "Int8",
    T.DoubleType: "Float64",
    T.FloatType: "Float32",
    T.BooleanType: "Bool",
    T.TimestampType: "DateTime64(6)",
    T.TimestampNTZType: "DateTime64(6)",
    T.DateType: "Date32",
    T.BinaryType: "String",
}


def clickhouse_type(dt: T.DataType, nullable: bool = False) -> str:
    """ClickHouse type for a Spark type. Decimals map by precision/scale;
    arrays recurse (ClickHouse arrays cannot hold Nullable inside Array
    for ORDER BY keys, matching CH semantics the inner type stays
    non-nullable here)."""
    if isinstance(dt, T.DecimalType):
        base = f"Decimal({dt.precision}, {dt.scale})"
    elif isinstance(dt, T.ArrayType):
        base = f"Array({clickhouse_type(dt.elementType, False)})"
    else:
        try:
            base = _CH_TYPES[type(dt)]
        except KeyError:
            raise ValueError(f"no ClickHouse mapping for Spark type {dt.simpleString()}")
    return f"Nullable({base})" if nullable else base


def clickhouse_ddl(
    schema: T.StructType,
    table: str,
    order_by: tuple[str, ...] = ("id", "_epoch"),
    engine: str = "ReplacingMergeTree",
) -> str:
    """CREATE TABLE DDL for a session-record batch. ReplacingMergeTree on
    (id, _epoch): a replayed foreachBatch epoch re-inserts identical keys
    and the engine merges them away — idempotent-by-epoch, the same
    guarantee the parquet fallback gets from its epoch column. ORDER BY
    columns must be non-nullable in ClickHouse, so key fields render bare
    even when Spark marks them nullable."""
    keyset = set(order_by)
    cols = ",\n  ".join(
        f"`{f.name}` {clickhouse_type(f.dataType, f.nullable and f.name not in keyset)}"
        for f in schema.fields
    )
    keys = ", ".join(f"`{c}`" for c in order_by)
    return (
        f"CREATE TABLE IF NOT EXISTS {table} (\n  {cols}\n)\n"
        f"ENGINE = {engine}\nORDER BY ({keys})"
    )


def clickhouse_insert(schema: T.StructType, table: str) -> str:
    """Column-stable INSERT the JDBC driver executes per batch; explicit
    column list so schema evolution (appended fields) never silently
    shifts values."""
    cols = ", ".join(f"`{f.name}`" for f in schema.fields)
    marks = ", ".join("?" for _ in schema.fields)
    return f"INSERT INTO {table} ({cols}) VALUES ({marks})"


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


def epoch_partitioned_parquet_writer(path: str):
    """foreachBatch writer with REPLAY IDEMPOTENCE, executable in this
    container (the ClickHouse analog — ReplacingMergeTree on (id,
    _epoch) — needs a live server): each batch lands in an
    ``_epoch=<id>`` partition via DYNAMIC partition overwrite, so
    replaying an epoch after a failure REPLACES its partition instead of
    appending duplicates. This is the standard exactly-once contract
    for file sinks: at-least-once delivery × idempotent-by-epoch write
    = exactly-once observed output.

    100 TB: overwrite touches only the replayed epoch's partition
    (dynamic mode), never the table; downstream readers see epoch
    directories — the same layout compact_small_files consumes.
    """

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        # per-write option, NOT the session conf: mutating the global
        # spark.sql.sources.partitionOverwriteMode would leak dynamic
        # semantics to (or steal static semantics from) concurrent
        # writers in the same session mid-write
        (
            batch_df.withColumn("_epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(path)
        )

    return fn
