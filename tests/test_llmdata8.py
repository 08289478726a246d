"""Hand-value and invariant tests for llmdata8 (pHash dedup, shingle
novelty, dead dims)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row

from prometheus_clickhouselog_exporter_spark.workloads.llmdata8 import (
    embedding_dead_dims,
    multimodal_image_phash_dedup,
    text_shingle_novelty,
)

SF_DIR = "/root/testdata/sf0.001"


def test_phash_identical_images_distance_zero(spark):
    """doc_ids with identical (w, h, pixel) synthesis params hash
    identically. w repeats every 16 ids, h every 16 (lcm 16 with the
    *3), pixels shift with id%256 — so no two ids < 64 are identical;
    instead certify self-consistency: hamming is symmetric-free (a<b),
    within [0, 64], and deterministic across runs."""
    rows1 = multimodal_image_phash_dedup(spark, SF_DIR).collect()
    rows2 = multimodal_image_phash_dedup(spark, SF_DIR).collect()
    assert [tuple(r) for r in rows1] == [tuple(r) for r in rows2]
    assert len(rows1) == 20
    for r in rows1:
        assert 0 <= r.hamming <= 64 and r.id_a < r.id_b
    hams = [r.hamming for r in rows1]
    assert hams == sorted(hams)


def test_phash_matches_numpy_reference(spark):
    """The full top-20 equals an independent numpy aHash replay of the
    synthesis formulas."""
    hashes = {}
    for i in range(64):
        w, h = 16 + i % 16, 8 + (i * 3) % 16
        sy = (np.arange(8) * h) // 8
        sx = (np.arange(8) * w) // 8
        r = (7 * sx[None, :] + i) % 256
        g = (11 * sy[:, None] + i) % 256
        b = (sx[None, :] + sy[:, None]) % 256
        lum = 299 * np.broadcast_to(r, (8, 8)) + 587 * np.broadcast_to(
            g, (8, 8)
        ) + 114 * b
        bits = (64 * lum.reshape(-1) > lum.sum()).astype(np.int64)
        hashes[i] = bits
    pairs = []
    for a in range(64):
        for b2 in range(a + 1, 64):
            pairs.append((int((hashes[a] != hashes[b2]).sum()), a, b2))
    want = [(a, b2, hm) for hm, a, b2 in sorted(pairs)[:20]]
    got = [(r.id_a, r.id_b, r.hamming)
           for r in multimodal_image_phash_dedup(spark, SF_DIR).collect()]
    assert got == want


def test_novelty_first_decile_is_total_and_rates_decrease_overall(spark):
    rows = text_shingle_novelty(spark, SF_DIR).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    # decile 1 contains the earliest docs: their shingles are mostly novel
    # and the LAST decile must be less novel than the first (saturation)
    assert rows[0].novelty_rate > rows[-1].novelty_rate
    total_novel = sum(r.novel for r in rows)
    # every distinct shingle is novel exactly once
    import duckdb

    n_distinct = duckdb.sql(
        f"""WITH toks AS (SELECT doc_id, string_split(lower(text),' ') t
              FROM '{SF_DIR}/documents.parquet'
              WHERE len(string_split(lower(text),' ')) >= 3)
            SELECT count(DISTINCT g) FROM (
              SELECT unnest(list_transform(range(1, len(t)-1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) g FROM toks)"""
    ).fetchone()[0]
    assert total_novel == n_distinct


def test_dead_dims_synthetic_constant_dim(spark, tmp_path):
    """A constant dimension must rank first with ~zero variance."""
    rows = []
    rng = range(200)
    for i in rng:
        vec = [float((i * 7 + j * 13) % 97) / 97.0 for j in range(64)]
        vec[5] = 0.5  # dim 5 constant
        rows.append(Row(vec_id=i, embedding=vec, label=i % 3))
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/embeddings.parquet")
    out = embedding_dead_dims(spark, str(tmp_path)).collect()
    assert out[0].dim == 5 and out[0].variance_rank == 1
    assert out[0].variance <= 1e-6
    shares = [r.cum_var_share_dropped for r in out]
    assert shares == sorted(shares)


def test_banded_phash_subset_of_bruteforce_and_pigeonhole_recall(spark):
    """Banded output ⊆ brute-force ≤12 pairs; pairs with hamming < 4
    are GUARANTEED retrieved (pigeonhole over 4 bands)."""
    from prometheus_clickhouselog_exporter_spark.workloads.llmdata8 import (
        multimodal_phash_banded_candidates,
    )

    hashes = {}
    for i in range(64):
        w, h = 16 + i % 16, 8 + (i * 3) % 16
        sy = (np.arange(8) * h) // 8
        sx = (np.arange(8) * w) // 8
        r = (7 * sx[None, :] + i) % 256
        g = (11 * sy[:, None] + i) % 256
        b = (sx[None, :] + sy[:, None]) % 256
        lum = (299 * np.broadcast_to(r, (8, 8))
               + 587 * np.broadcast_to(g, (8, 8)) + 114 * b)
        bits = (64 * lum.reshape(-1) > lum.sum()).astype(np.int64)
        hashes[i] = bits
    brute = {}
    for a in range(64):
        for b2 in range(a + 1, 64):
            brute[(a, b2)] = int((hashes[a] != hashes[b2]).sum())
    got = {(r.id_a, r.id_b): r.hamming
           for r in multimodal_phash_banded_candidates(spark, SF_DIR).collect()}
    for pair, hm in got.items():
        assert brute[pair] == hm and hm <= 12
    for pair, hm in brute.items():
        if hm < 4:
            assert pair in got  # pigeonhole guarantee
