"""Streaming mergeable MinHash signatures — the second instance of the
versioned idempotent-merge recipe (streaming/merge_state.py), with
elementwise MIN as the merge operator.

Incrementally maintains per-source MinHash signatures as documents
stream in: each batch shingles its documents, hashes through the
engine-portable md5 family (the workloads/llmdata6
sketch_minhash_source_merge recipe, same perms), folds to per-
(source, perm) minima, and MIN-merges into the versioned state. Since
min is idempotent/commutative/associative, a replayed batch cannot
move a signature — exactly-once without a log — and the final state
equals the BATCH signature of everything seen (the mergeability
property, certified cross-surface by
tests/test_streaming_minhash.py's stream==batch parity check).

100 TB: state is |sources|·|perms| rows; per batch the shuffle
carries the batch's per-source partial minima plus the state — never
postings, never documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import word_shingles
from ..workloads.core import md5_long
from ..workloads.llmdata6 import _N_PERMS as N_PERMS  # SAME family+width as batch
from .merge_state import merge_versioned_state


def fold_signatures(batch: DataFrame) -> DataFrame:
    """documents (source, text) → per-(source, perm) partial minima."""
    post = (
        batch.filter(F.size(F.split(F.col("text"), " ")) >= 3)
        .select("source", F.explode(word_shingles(F.col("text"), 3)).alias("g"))
        .distinct()
        .select(
            "source",
            "g",
            F.explode(F.sequence(F.lit(0), F.lit(N_PERMS - 1))).alias("perm"),
        )
    )
    h = md5_long(F.concat(F.col("g"), F.lit("#"), F.col("perm")))
    return post.select("source", "perm", h.alias("sig")).groupBy(
        "source", "perm"
    ).agg(F.min("sig").alias("sig"))


def _merge(u: DataFrame) -> DataFrame:
    return u.groupBy("source", "perm").agg(F.min("sig").alias("sig"))


def merge_minhash_batch(
    batch: DataFrame, batch_id: int, state_dir: str
) -> DataFrame:
    """foreachBatch body: MIN-merge this batch's signature partials into
    the versioned state; returns the landed state."""
    return merge_versioned_state(batch, batch_id, state_dir, fold_signatures, _merge)


def start_minhash_signatures(docs: DataFrame, state_dir: str, checkpoint: str):
    """documents (source, text) stream → running per-source MinHash
    signatures in ``state_dir`` (versioned; newest version = current)."""
    return (
        docs.select("source", "text")
        .writeStream.outputMode("update")
        .foreachBatch(lambda b, bid: merge_minhash_batch(b, bid, state_dir))
        .option("checkpointLocation", checkpoint)
        .start()
    )
