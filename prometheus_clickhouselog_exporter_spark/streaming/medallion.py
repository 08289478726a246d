"""Medallion pipeline: streaming CDC ingestion with an exactly-once
bronze layer and a latest-wins silver snapshot.

The composition every lakehouse ingestion runs, built from this repo's
certified parts:

- BRONZE: each micro-batch of change rows lands via
  ``epoch_partitioned_parquet_writer`` semantics (dynamic epoch
  partition overwrite) — replaying a failed epoch REPLACES its
  partition, so bronze is exactly-once under at-least-once delivery.
- SILVER: after each batch, the snapshot is recomputed from bronze by
  the ``cdc_apply_latest_changes`` rule — latest change per key wins,
  a winning delete tombstone removes the key — and written atomically
  (full overwrite of the silver directory).

Recompute-from-bronze (rather than merge-into-silver) is the
small/medium-scale shape: correctness is trivial (silver is a pure
function of bronze, so crash anywhere and rerun), at the cost of
re-reading bronze per batch. At 100 TB, swap the silver step for the
incremental form: yesterday's silver ∪ today's bronze epochs through
the SAME latest-wins plan (incremental_agg_merge's base+delta shape) —
the rule, and therefore the tests, do not change.

Reference analog: this is the exporter's whole tail→state→sink loop
(main.go:100-129) rebuilt with durable, replayable layers in place of
the in-memory map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def apply_latest_wins(changes: DataFrame, key: str, seq_cols: list[str], op_col: str = "op") -> DataFrame:
    """The CDC resolution rule as a reusable operator: latest change per
    key (by seq_cols, descending) wins; a winning ``op='D'`` tombstone
    drops the key. Tombstone filter runs AFTER the rank — older upserts
    must not resurrect a deleted key."""
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in seq_cols])
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != "D"))
        .drop("_rn")
    )


class MedallionPipeline:
    """foreachBatch driver for the bronze→silver flow."""

    def __init__(self, bronze_path: str, silver_path: str, key: str, seq_cols: list[str]):
        self.bronze_path = bronze_path
        self.silver_path = silver_path
        self.key = key
        self.seq_cols = seq_cols

    def foreach_batch(self):
        from .jdbc import epoch_partitioned_parquet_writer

        bronze_write = epoch_partitioned_parquet_writer(self.bronze_path)

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            spark = batch_df.sparkSession
            bronze_write(batch_df, epoch_id)
            bronze = spark.read.parquet(self.bronze_path).drop("_epoch")
            silver = apply_latest_wins(bronze, self.key, self.seq_cols)
            silver.write.mode("overwrite").parquet(self.silver_path)

        return fn

    def snapshot(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.silver_path)
