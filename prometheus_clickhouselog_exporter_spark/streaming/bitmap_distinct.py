"""Streaming EXACT distinct counting with mergeable bitmap state —
the incremental twin of workloads/relational11.agg_bitmap_distinct_exact.

Maintaining an exact distinct count across micro-batches normally
means keeping every seen id in state. The bitmap form keeps ONE fixed-
size bitmap per (key, 32k id-bucket) instead, and its merge operator —
bitwise OR — is IDEMPOTENT, which is what makes the sink exactly-once
under replay for free: re-merging a batch that was already absorbed
cannot change a single bit. State lives as versioned parquet
(``state_dir/v{batch_id}``): each foreachBatch invocation reads the
latest version strictly BEFORE its batch id, ORs the batch's bitmaps
in, and (over)writes its own version — a replayed batch re-reads the
same predecessor and rewrites the same successor, landing in the same
state (the epoch-overwrite discipline of streaming/medallion.py
applied to aggregate state instead of rows).

Per batch a counts snapshot (event_type, distinct_users, batch_id) is
appended to ``out_dir`` partitioned by batch_id with dynamic partition
overwrite — replaying a batch overwrites its own partition, never
duplicates it.

100 TB: state size is |keys|·|occupied buckets|·4 KB — bounded by the
id space, not the stream length; the per-batch merge joins batch
bitmaps against state bitmaps on (key, bucket), shuffling fixed-size
binaries only. Reference analog: the unbounded per-key map the
exporter grows (main.go:110-129), replaced by a mergeable bounded
sketch with zero error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .merge_state import merge_versioned_state


def merge_bitmap_batch(
    batch: DataFrame, batch_id: int, state_dir: str, out_dir: str
) -> None:
    """The foreachBatch body (public so tests can replay it directly):
    fold the batch to (event_type, bucket) bitmaps, OR into the latest
    prior state via the shared versioned-merge recipe, write the
    counts partition."""

    def fold(b: DataFrame) -> DataFrame:
        return b.groupBy(
            "event_type", F.expr("bitmap_bucket_number(user_id)").alias("b")
        ).agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm")
        )

    def merge(u: DataFrame) -> DataFrame:
        return u.groupBy("event_type", "b").agg(
            F.expr("bitmap_or_agg(bm)").alias("bm")
        )

    state = merge_versioned_state(batch, batch_id, state_dir, fold, merge)
    counts = (
        state.groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("distinct_users"))
        .withColumn("batch_id", F.lit(batch_id).cast("long"))
    )
    (
        counts.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out_dir)
    )


def start_bitmap_distinct(
    events: DataFrame, state_dir: str, out_dir: str, checkpoint: str
):
    """events (user_id, event_type) stream → running EXACT per-type
    distinct-user counts in ``out_dir``, bitmap state in ``state_dir``."""
    return (
        events.select("user_id", "event_type")
        .writeStream.outputMode("update")
        .foreachBatch(
            lambda b, bid: merge_bitmap_batch(b, bid, state_dir, out_dir)
        )
        .option("checkpointLocation", checkpoint)
        .start()
    )
