"""Tests for the LLM-data operators that the DuckDB oracle cannot check:
SimHash recall, LSH similarity recall vs brute force, multimodal plumbing.
The oracle-checkable ones (minhash, jaccard, fingerprint, quality, …) are
covered by tools/check_oracle.py and the driver."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.operators.dedup import (
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
    word_shingles,
)
from prometheus_clickhouselog_exporter_spark.operators.multimodal import (
    attach_fake_media,
    decode_features,
    frame_sample_stub,
)
from prometheus_clickhouselog_exporter_spark.operators.similarity import (
    cosine_topk,
    lsh_bucketed_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def exact_pairs(spark, docs):
    """Brute-force shingle-Jaccard ≥ 0.5 ground truth."""
    sh = docs.select("doc_id", word_shingles(F.col("text"), 3).alias("s"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.s"), F.col("b.s")))
    union = F.size(F.array_union(F.col("a.s"), F.col("b.s")))
    rows = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn("j", inter / union)
        .filter(F.col("j") >= 0.5)
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .collect()
    )
    return {(r["x"], r["y"]) for r in rows}


def test_minhash_matches_exact(docs, exact_pairs):
    got = {(r["id_a"], r["id_b"]) for r in minhash_lsh_dedup(docs, "text", "doc_id", 0.5).collect()}
    assert got == exact_pairs and len(exact_pairs) > 0


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5_60"])
def test_simhash_recall_and_precision(docs, exact_pairs, hash_fn):
    """Shingle-weighted SimHash. Deterministic (fixed hash, no RNG):
    measured 24/28 planted-pair recall at Hamming ≤ 6 with ~zero false
    positives on this corpus (the misses sit at Hamming 7-12 — the
    sketch's resolution limit, found by loosening the cutoff). Both hash
    families must clear the bar: xxhash64 (operator default, cheap JVM
    hash) and md5_60 (the driver query's oracle-computable variant)."""
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_dedup(docs, "text", "doc_id", max_hamming=6, hash_fn=hash_fn).collect()
    }
    recall = len(exact_pairs & got) / len(exact_pairs)
    assert recall >= 0.85, f"recall {recall}: {len(exact_pairs & got)}/{len(exact_pairs)}"
    # precision: the token-weighted variant returned thousands of pairs
    # here; shingle features keep non-dup collisions near zero.
    assert len(got) <= len(exact_pairs) + 10, f"{len(got)} pairs returned"


def test_ngram_token_jaccard_runs(spark, docs):
    # token-level variant (the generic operator); tiny vocab ⇒ many pairs,
    # just verify shape + determinism of a sample
    pairs = ngram_jaccard_pairs(docs.limit(50), "text", "doc_id", threshold=0.8)
    rows = pairs.collect()
    assert all(0.8 <= r["jaccard"] <= 1.0 for r in rows)


def test_lsh_similarity_recall_vs_bruteforce(emb):
    queries = emb.filter(F.col("vec_id") < 8)
    exact = cosine_topk(emb, queries, "embedding", "vec_id", "vec_id", k=10).collect()
    approx = lsh_bucketed_topk(emb, queries, "embedding", "vec_id", "vec_id", k=10, n_planes=6).collect()
    exact_set = {(r["query_id"], r["nbr_id"]) for r in exact}
    approx_set = {(r["query_id"], r["nbr_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 24 tables × 6 planes × 3 probes, deterministic seed: measured 98.8%
    # top-10 recall on this corpus (62.5% without multi-probe; 2% random).
    # ≥0.9 pins the recall-biased defaults.
    assert recall >= 0.9, f"recall {recall}"
    assert all(r["rk"] <= 10 for r in approx)


def test_multimodal_roundtrip(spark, docs):
    media = attach_fake_media(docs.select("doc_id").limit(100), "doc_id")
    feats = {r["doc_id"]: r for r in decode_features(media).collect()}
    assert len(feats) == 100
    for doc_id, r in feats.items():
        assert r["width"] == doc_id % 64 + 16
        assert r["height"] == (doc_id * 7) % 64 + 16
        assert r["payload_bytes"] == len(f"payload-{doc_id}")


def test_multimodal_decode_rejects_unknown_format(spark):
    df = spark.createDataFrame([(1, bytearray(b"JPEGnotreally"))], "doc_id long, media binary")
    with pytest.raises(Exception, match="NotImplementedError|image/audio library"):
        decode_features(df).collect()


def test_frame_sampling_expands_rows(spark, docs):
    media = attach_fake_media(docs.select("doc_id").limit(10), "doc_id", kind="video")
    frames = frame_sample_stub(media, "media", every_n=1).collect()
    assert len(frames) >= 10  # ≥1 frame per video
    assert {f["doc_id"] for f in frames} == {r["doc_id"] for r in docs.limit(10).collect()}


def test_ivf_similarity_recall_vs_bruteforce(emb):
    from prometheus_clickhouselog_exporter_spark.operators.similarity import ivf_topk

    queries = emb.filter(F.col("vec_id") < 8)
    exact = cosine_topk(emb, queries, "embedding", "vec_id", "vec_id", k=10).collect()
    approx = ivf_topk(emb, queries, "embedding", "vec_id", "vec_id", k=10).collect()
    exact_set = {(r["query_id"], r["nbr_id"]) for r in exact}
    approx_set = {(r["query_id"], r["nbr_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # probing 4 of 16 cells touches ~25% of the corpus; near neighbors
    # concentrate in the probed cells, so recall must beat that baseline.
    assert recall >= 0.4, f"recall {recall}"


def test_blocked_gemm_pairs_match_expression_form(spark, emb):
    """The blocked-GEMM kernel must reproduce the expression-form pair set
    exactly (same pairs; cosines equal to ~1e-12 — BLAS reduction order
    differs from the sequential fold)."""
    from prometheus_clickhouselog_exporter_spark.operators.dedup import (
        embedding_cosine_pairs,
        embedding_cosine_pairs_blocked,
    )

    thr = 0.35
    want = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_pairs(emb, "embedding", "vec_id", thr).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_pairs_blocked(
            emb, "embedding", "vec_id", thr, n_blocks=5
        ).collect()
    }
    # Pair sets may differ only for cosines within float-reduction slack
    # of the threshold; none exist at this threshold on this corpus.
    assert set(got) == set(want)
    assert len(got) > 0
    for k, v in got.items():
        assert abs(v - want[k]) < 1e-9, k


def test_blocked_gemm_rejects_oversized_corpus(spark, emb):
    """The exact kernel enforces its validation-scale contract: inputs over
    max_rows raise with a pointer to the LSH/IVF scale path instead of
    silently building B² quadratic block pairs."""
    from prometheus_clickhouselog_exporter_spark.operators.dedup import (
        embedding_cosine_pairs_blocked,
    )

    with pytest.raises(ValueError, match="lsh_bucketed_topk"):
        embedding_cosine_pairs_blocked(emb, "embedding", "vec_id", max_rows=5)


def test_blocked_gemm_derives_blocks_and_matches_explicit(spark, emb):
    """n_blocks=None derives block count from target bytes + parallelism and
    still reproduces the explicit-n_blocks pair set."""
    from prometheus_clickhouselog_exporter_spark.operators.dedup import (
        embedding_cosine_pairs_blocked,
    )

    want = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs_blocked(
            emb, "embedding", "vec_id", 0.35, n_blocks=5
        ).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs_blocked(emb, "embedding", "vec_id", 0.35).collect()
    }
    assert got == want and len(got) > 0


def test_ivf_topk_builds_without_count_job(spark, emb, monkeypatch):
    """The quantizer's training sample must not run a count() prerequisite
    over the corpus (at 100 TB that is an extra full scan before the query);
    the hash-ordered TakeOrdered sample needs no cardinality."""
    from pyspark.sql import DataFrame

    from prometheus_clickhouselog_exporter_spark.operators.similarity import ivf_topk

    def boom(self):
        raise AssertionError("ivf_topk must not call DataFrame.count()")

    monkeypatch.setattr(DataFrame, "count", boom)
    queries = emb.filter(F.col("vec_id") < 4)
    out = ivf_topk(emb, queries, "embedding", "vec_id", "vec_id", k=5)
    assert len(out.collect()) > 0


def test_wav_roundtrip_dsp_features(spark):
    """Real RIFF/WAVE PCM16 round-trip: synthesized sines decode to the
    expected DSP features — RMS ≈ amp/√2, peak ≈ amp, zero-crossing rate
    ≈ 2f/sr, dominant frequency exactly on its FFT bin."""
    from prometheus_clickhouselog_exporter_spark.operators.multimodal import (
        decode_wav_features,
        synth_wav,
    )

    ids = spark.range(0, 30).selectExpr("id AS doc_id")
    feats = {r["doc_id"]: r for r in decode_wav_features(synth_wav(ids, "doc_id")).collect()}
    assert len(feats) == 30
    for doc_id, r in feats.items():
        f = 100.0 + (doc_id % 25) * 8.0
        assert r["sample_rate"] == 8000 and r["n_samples"] == 2000
        assert r["dominant_freq_hz"] == f
        assert abs(r["rms"] - 0.5 / 2**0.5) < 0.005, (doc_id, r["rms"])
        assert abs(r["peak"] - 0.5) < 0.005
        assert abs(r["zero_cross_rate"] - 2 * f / 8000) < 0.002, (doc_id, r["zero_cross_rate"])


def test_wav_decode_rejects_non_wav(spark):
    from prometheus_clickhouselog_exporter_spark.operators.multimodal import (
        decode_wav_features,
    )

    df = spark.createDataFrame([(1, bytearray(b"ID3notawav" * 5))], "doc_id long, media binary")
    with pytest.raises(Exception, match="NotImplementedError|soundfile"):
        decode_wav_features(df).collect()


def test_wav_decode_fails_loudly_on_truncated_container(spark):
    """A RIFF/WAVE header with no data chunk must raise, not loop or
    return garbage."""
    import struct as _s

    from prometheus_clickhouselog_exporter_spark.operators.multimodal import (
        decode_wav_features,
    )

    blob = (
        b"RIFF" + _s.pack("<I", 36) + b"WAVEfmt "
        + _s.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"junk" + _s.pack("<I", 0)
    )
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, media binary")
    with pytest.raises(Exception, match="malformed WAV|no data chunk"):
        decode_wav_features(df).collect()


def test_bmp_roundtrip_pixel_features(spark):
    """Real 24-bit BMP round-trip: synthesized images decode to the
    exact per-channel means and probe pixel predicted by the pixel
    formulas — certifying bottom-up row order, BGR→RGB swap, and 4-byte
    row padding all at once."""
    from prometheus_clickhouselog_exporter_spark.operators.multimodal import (
        decode_bmp_features,
        synth_bmp,
    )

    ids = spark.range(0, 32).selectExpr("id AS doc_id")
    feats = {r["doc_id"]: r for r in decode_bmp_features(synth_bmp(ids, "doc_id")).collect()}
    assert len(feats) == 32
    for i, r in feats.items():
        w, h = 16 + i % 16, 8 + (i * 3) % 16
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_r"] == sum((7 * x + i) % 256 for x in range(w)) / w
        assert r["mean_g"] == sum((11 * y + i) % 256 for y in range(h)) / h
        assert r["probe_g12"] == (22 + i) % 256


def test_bmp_decode_rejects_non_bmp_and_compressed(spark):
    from prometheus_clickhouselog_exporter_spark.operators.multimodal import (
        decode_bmp_features,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64))], "doc_id long, media binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        decode_bmp_features(df).collect()


def test_y4m_roundtrip_video_features(spark):
    """Real YUV4MPEG2 round-trip: synthesized clips decode to the exact
    luma mean, inter-frame motion, and probe sample the formulas
    predict — certifying header parse, FRAME walking, and plane offsets."""
    from prometheus_clickhouselog_exporter_spark.operators.multimodal import (
        decode_y4m_features,
        synth_y4m,
    )

    ids = spark.range(0, 24).selectExpr("id AS doc_id")
    feats = {r["doc_id"]: r for r in decode_y4m_features(synth_y4m(ids, "doc_id")).collect()}
    assert len(feats) == 24
    for i, r in feats.items():
        w, h, nf = 16 + (i % 8) * 2, 8 + (i % 6) * 2, 3 + i % 4
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf)
        mean_y = sum(
            (5 * x + 3 * y + 17 * t + i) % 256
            for x in range(w) for y in range(h) for t in range(nf)
        ) / (w * h * nf)
        assert r["mean_y"] == mean_y
        assert r["probe_y"] == (5 * 1 + 3 * 2 + 17 * 1 + i) % 256


def test_y4m_decode_rejects_subsampled_and_foreign(spark):
    from prometheus_clickhouselog_exporter_spark.operators.multimodal import (
        decode_y4m_features,
    )
    import pytest as _pytest

    sub = b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\n" + b"FRAME\n" + b"\x00" * 24
    df = spark.createDataFrame([(1, bytearray(sub))], "doc_id long, media binary")
    with _pytest.raises(Exception, match="C444|NotImplementedError"):
        decode_y4m_features(df).collect()


def test_pq_adc_recall_vs_bruteforce(emb):
    """Pin PQ-ADC recall at DEFAULT parameters (the sign-LSH pattern):
    measured 76.25% top-10 recall on the iid-synthetic sf0.001 corpus —
    a PQ worst case (no manifold structure for the subquantizers to
    exploit); ≥0.7 guards the defaults against a silent codebook or
    encode regression while leaving noise margin."""
    from prometheus_clickhouselog_exporter_spark.operators.similarity import pq_adc_topk

    queries = emb.filter(F.col("vec_id") < 8)
    exact = cosine_topk(emb, queries, "embedding", "vec_id", "vec_id", k=10).collect()
    approx = pq_adc_topk(emb, queries, "embedding", "vec_id", "vec_id", k=10).collect()
    exact_set = {(r["query_id"], r["nbr_id"]) for r in exact}
    approx_set = {(r["query_id"], r["nbr_id"]) for r in approx}
    assert len(approx_set) == len(exact_set)
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.7, f"recall {recall}"


def test_ivfpq_recall_vs_bruteforce(emb):
    """Pin IVF-PQ recall at DEFAULT parameters: measured 48.75% on this
    corpus — dominated by the IVF pruning ceiling (4 of 16 cells probed
    ~= 25% of an iid corpus touched), so ≥0.4 mirrors the plain-IVF
    pin's rationale: approximation must beat the touched-fraction
    baseline, proving residual ADC ranks candidates better than chance."""
    from prometheus_clickhouselog_exporter_spark.operators.similarity import ivfpq_topk

    queries = emb.filter(F.col("vec_id") < 8)
    exact = cosine_topk(emb, queries, "embedding", "vec_id", "vec_id", k=10).collect()
    approx = ivfpq_topk(emb, queries, "embedding", "vec_id", "vec_id", k=10).collect()
    exact_set = {(r["query_id"], r["nbr_id"]) for r in exact}
    approx_set = {(r["query_id"], r["nbr_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, f"recall {recall}"
