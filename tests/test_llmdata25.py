"""Round 8 batch 6: streaming weighted reservoir, RAKE keywords,
zone-map skipping."""

from __future__ import annotations

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_reservoir_equals_batch_sample(spark):
    """The streaming fold over 4 micro-batches must reproduce the batch
    A-ES sample row-for-row — max-k is order-free."""
    batch = {
        (r.event_type, r.rk): (r.event_id, r.key_q)
        for r in QUERIES["sample_reservoir_weighted"](spark, SF_DIR).collect()
    }
    stream = {
        (r.event_type, r.rk): (r.event_id, r.key_q)
        for r in QUERIES["streaming_reservoir_fidelity"](spark, SF_DIR).collect()
    }
    assert stream == batch and len(batch) == 100


def test_rake_phrases_are_stopword_free_runs(spark):
    from pyspark.sql import functions as F

    rows = QUERIES["text_rake_keywords"](spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 20
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.score_q for r in rows]
    assert scores == sorted(scores, reverse=True)
    # derive the same in-plan stopword list and check no phrase uses one
    toks = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .count()
        .orderBy(F.desc("count"), "tok")
        .limit(5)
        .collect()
    )
    stop = {r.tok for r in toks}
    for r in rows:
        words = r.phrase.split(" ")
        assert len(words) == r.n_words
        assert not (set(words) & stop)
        assert r.n_occurrences >= 1


def test_zonemap_clustered_layout_skips(spark):
    r = QUERIES["layout_zonemap_skipping"](spark, SF_DIR).collect()[0]
    assert r.prune_exact is True
    assert r.rows_matched > 0
    # interleaved files span the value range -> almost no skipping;
    # clustered files serve the ~4% predicate from a handful
    assert r.files_scanned_rand >= (r.n_files_rand * 3) // 4
    assert r.files_scanned_clust <= max(4, r.n_files_clust // 4)
    assert r.files_scanned_clust * 3 <= r.files_scanned_rand
