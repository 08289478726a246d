"""Round 13 batch 3: Breslow–Day, context sweep, audio fingerprints,
keep-best dedup, nDCG/MRR, uniqUpTo/topK — invariants beyond the hash."""

from __future__ import annotations

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_breslow_day_structure(spark):
    r = QUERIES["stats_breslow_day"](spark, SF_DIR).collect()[0]
    assert r.n_strata == 5
    assert r.psi_mh > 0.0
    assert r.chi2_bd >= 0.0
    # Tarone's correction only ever subtracts a non-negative term
    assert r.chi2_tarone <= r.chi2_bd + 1e-9
    mh = QUERIES["stats_mantel_haenszel"](spark, SF_DIR).collect()[0]
    assert abs(r.psi_mh - mh.or_mh) < 1e-5  # same cells, same common OR


def test_context_sweep_monotonicity(spark):
    rows = QUERIES["pack_context_length_sweep"](spark, SF_DIR).collect()
    assert [r.ctx for r in rows] == [256, 512, 1024, 2048]
    real = {r.real_tokens for r in rows}
    assert len(real) == 1  # real token mass is L-invariant
    for r in rows:
        assert r.padded_tokens >= r.real_tokens
        assert 0.0 <= r.pad_waste < 1.0
        assert 0.0 <= r.trunc1_loss_ratio < 1.0
    # longer contexts truncate less, and split fewer docs
    for a, b in zip(rows, rows[1:]):
        assert b.trunc1_loss_tokens <= a.trunc1_loss_tokens
        assert b.n_docs_split <= a.n_docs_split


def test_audio_fingerprint_twins(spark):
    rows = QUERIES["audio_fingerprint_hamming_pairs"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hamming <= 1
        assert r.clip_a < r.clip_b
    # every planted stem-drop twin is within the Hamming ball (distance
    # is 1, or 0 when another partial shares the dropped band)
    twins = {(r.clip_a, r.clip_b) for r in rows if r.clip_b == r.clip_a + 100}
    assert len(twins) == 64


def test_keep_best_prefers_longest(spark):
    rows = QUERIES["dedup_cluster_keep_best"](spark, SF_DIR).collect()
    cc = {
        r.cluster_id: r
        for r in QUERIES["dedup_minhash_clusters_cc"](spark, SF_DIR).collect()
    }
    assert rows and set(r.cluster_id for r in rows) == set(cc)
    for r in rows:
        assert r.n_members == cc[r.cluster_id].n_members
        assert r.n_members >= 2
        assert r.keeper_tokens >= 1
        assert r.removed_tokens >= 0


def test_ndcg_mrr_bounds(spark):
    rows = QUERIES["eval_ndcg_mrr_at_k"](spark, SF_DIR).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0.0 <= r.p_at_10 <= 1.0
        assert 0.0 <= r.r_at_10 <= 1.0
        assert 0.0 <= r.mrr_at_10 <= 1.0
        assert 0.0 <= r.ndcg_at_10 <= 1.0
        assert r.hits10 <= min(10, r.n_rel)
        # binary gains: hits==10 forces a perfect prefix only when
        # n_rel >= 10; then nDCG@10 == 1
        if r.hits10 == 10:
            assert abs(r.ndcg_at_10 - 1.0) < 1e-6
        if r.hits10 > 0:
            assert r.mrr_at_10 > 0.0


def test_uniq_upto_saturation(spark):
    rows = QUERIES["clickhouse_uniq_upto_topk"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.uniq_upto_8 <= 9  # saturates at N+1
        # scalar top-3 (r14: flat columns so the driver canonicalizer
        # can sort the frame — no array-typed final columns)
        tops = [r.top1_bucket, r.top2_bucket, r.top3_bucket]
        filled = [t for t in tops if t is not None]
        assert r.top1_bucket is not None
        assert len(set(filled)) == len(filled)  # distinct buckets
        # NULLs only trail: rank i empty ⇒ rank i+1 empty
        assert tops == filled + [None] * (3 - len(filled))


def test_video_pairs_are_exactly_the_twins(spark):
    rows = QUERIES["video_luma_signature_pairs"](spark, SF_DIR).collect()
    assert len(rows) == 64
    for r in rows:
        assert r.clip_b == r.clip_a + 100  # measured margin: only twins
        assert r.d1_sum >= 0 and r.d2_sum >= 0
