"""Streaming MinHash signatures: the MIN-merged state after all
batches must equal the one-shot batch signature of the full corpus
(mergeability across the streaming surface), and replay must be a
no-op (idempotence = exactly-once)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.streaming.minhash_sink import (
    fold_signatures,
    merge_minhash_batch,
    start_minhash_signatures,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _write_docs(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(cols[0], pa.int64()),
                "text": pa.array(cols[1], pa.string()),
                "lang": pa.array(cols[2], pa.string()),
                "source": pa.array(cols[3], pa.string()),
                "n_chars": pa.array(cols[4], pa.int64()),
            }
        ),
        str(path),
    )


B1 = [
    (1, "the quick brown fox jumps over the lazy dog", "en", "s1", 1),
    (2, "pack my box with five dozen liquor jugs", "en", "s2", 1),
]
B2 = [
    (3, "the quick brown fox naps under the old tree", "en", "s1", 1),
    (4, "sphinx of black quartz judge my vow", "en", "s2", 1),
]


def test_stream_state_equals_batch_signature(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    _write_docs(in_dir / "b1.parquet", B1)
    q = start_minhash_signatures(
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir)),
        state_dir=str(tmp_path / "state"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        _write_docs(in_dir / "b2.parquet", B2)
        q.processAllAvailable()
    finally:
        q.stop()
    import os

    versions = sorted(
        int(v[1:]) for v in os.listdir(tmp_path / "state") if v.startswith("v")
    )
    streamed = spark.read.parquet(f"{tmp_path}/state/v{versions[-1]}")
    batch = fold_signatures(_docs(spark, B1 + B2))
    got = {(r.source, r.perm): r.sig for r in streamed.collect()}
    want = {(r.source, r.perm): r.sig for r in batch.collect()}
    assert got == want and got


def test_replay_batch_is_noop(spark, tmp_path):
    state = str(tmp_path / "state")
    b = _docs(spark, B1)
    first = {
        (r.source, r.perm): r.sig
        for r in merge_minhash_batch(b, 0, state).collect()
    }
    again = {
        (r.source, r.perm): r.sig
        for r in merge_minhash_batch(b, 0, state).collect()
    }
    assert first == again
    # re-feeding the same docs as a LATER batch also cannot move a min
    later = {
        (r.source, r.perm): r.sig
        for r in merge_minhash_batch(b, 1, state).collect()
    }
    assert later == first
