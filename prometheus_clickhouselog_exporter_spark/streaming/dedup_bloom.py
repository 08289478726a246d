"""Streaming incremental Bloom dedup: "dedup today's stream against
everything already seen" as a foreachBatch pipeline.

Per micro-batch: probe each row against the accumulated bitmap IN THE
SCAN STAGE (plan-literal predicate, operators/bloom.py), tag rows
``definitely_new`` (bloom miss — no false negatives) vs ``candidate_dup``
(bloom hit — false-positive rate bounded by m/k sizing; downstream exact
verification is the batch operator ``dedup_incremental_bloom``'s verify
join), then fold the batch's own keys into the bitmap with a bytewise OR
of two bloom builds — set union is exactly bitmap OR, the property that
makes Bloom state mergeable across batches, executors, and days.

The bitmap is driver-held (KBs–MBs, same order as Spark's own runtime
bloom filters). Restart semantics: rebuild from the already-written sink
output (one ``bloom_build`` over the seen keys) — the bitmap is a pure
function of the emitted rows, so checkpoint recovery stays exact; this
mirrors how the batch operator derives its bitmap from the corpus each
run. Reference analog: the exporter's seen-query-ID map (query.go:91-95)
as unbounded streaming membership state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.bloom import bloom_build, bloom_might_contain


class StreamingBloomDedup:
    """foreachBatch state holder. ``writer(tagged_df, epoch_id)`` receives
    the batch with an ``is_candidate_dup`` column; rows where it is False
    are guaranteed first occurrences."""

    def __init__(self, key_col: str, m_bits: int = 1 << 17, k: int = 3):
        self.key_col = key_col
        self.m_bits = m_bits
        self.k = k
        self.bitmap: bytes | None = None

    def _merge(self, other: bytes) -> None:
        if self.bitmap is None:
            self.bitmap = other
        else:
            self.bitmap = bytes(a | b for a, b in zip(self.bitmap, other))

    def foreach_batch(self, writer):
        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            key = F.col(self.key_col)
            if self.bitmap is None:
                tagged = batch_df.withColumn("is_candidate_dup", F.lit(False))
            else:
                tagged = batch_df.withColumn(
                    "is_candidate_dup",
                    bloom_might_contain(key, self.bitmap, self.m_bits, self.k),
                )
            writer(tagged, epoch_id)
            # Fold this batch's keys in AFTER tagging: within-batch repeats
            # are resolved by the downstream exact step, like the batch op.
            self._merge(bloom_build(batch_df, key, m_bits=self.m_bits, k=self.k))

        return fn

    def rebuild_from(self, seen: DataFrame) -> None:
        """Checkpoint recovery: reconstruct the bitmap from already-emitted
        rows (the bitmap is a pure function of the seen key set)."""
        self.bitmap = bloom_build(seen, F.col(self.key_col), m_bits=self.m_bits, k=self.k)
