"""Hand-value and brute-force tests for the suffix-array longest
duplicate substring operators (llmdata13)."""

from __future__ import annotations

from pyspark.sql import Row

from prometheus_clickhouselog_exporter_spark.workloads.llmdata13 import (
    _L,
    _suffix_lcp,
    dedup_longest_substring,
    dedup_longest_substring_topk,
)


def _write_docs(spark, tmp_path, texts):
    rows = [
        Row(doc_id=i, text=t, lang="en", source="src0", n_chars=len(t))
        for i, t in enumerate(texts)
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _brute_longest_dup(texts):
    """Per-doc longest token span occurring at >= 2 distinct (doc, pos)
    sites, O(n^2) reference."""
    toks = [t.split() for t in texts]
    sufs = []  # (doc, pos, tuple-of-tokens)
    for d, tk in enumerate(toks):
        for p in range(len(tk)):
            sufs.append((d, p, tuple(tk[p:])))
    best: dict[int, int] = {}
    for i in range(len(sufs)):
        for j in range(i + 1, len(sufs)):
            a, b = sufs[i][2], sufs[j][2]
            lcp = 0
            while lcp < min(len(a), len(b)) and a[lcp] == b[lcp]:
                lcp += 1
            for d in (sufs[i][0], sufs[j][0]):
                if lcp > best.get(d, 0):
                    best[d] = lcp
    return best


def test_planted_duplicate_span(spark, tmp_path):
    shared = " ".join(f"w{i}" for i in range(15))  # 15-token planted span
    texts = [
        "alpha beta " + shared + " gamma delta",
        "zeta " + shared + " eta theta iota",
        "unique tokens only here nothing repeats at all believe me",
    ]
    sf = _write_docs(spark, tmp_path, texts)
    got = {r.doc_id: r for r in dedup_longest_substring(spark, sf).collect()}
    assert set(got) == {0, 1}  # doc 2 has no >= _L dup
    assert got[0].longest_dup == 15
    assert got[1].longest_dup == 15
    assert got[0].longest_cross_dup == 15
    top = dedup_longest_substring_topk(spark, sf).collect()
    assert top[0].dup_text == shared
    assert top[0].len_tokens == 15
    assert top[0].n_pairs == 1


def test_intra_doc_repeat_counts(spark, tmp_path):
    span = " ".join(f"r{i}" for i in range(12))
    texts = ["start " + span + " middle " + span + " end"]
    sf = _write_docs(spark, tmp_path, texts)
    got = dedup_longest_substring(spark, sf).collect()
    assert len(got) == 1
    assert got[0].longest_dup == 12
    assert got[0].longest_cross_dup is None  # same-doc repeat only


def test_adjacency_max_equals_bruteforce(spark, tmp_path):
    # Mixed corpus: exact dup pair, overlapping partial copies, noise.
    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = [
        base,
        base,  # exact duplicate (13-token LCP at pos 0)
        "prefix words " + " ".join(base.split()[:11]) + " custom tail here",
        "completely different content with no overlap whatsoever in it",
        "the quick brown fox sleeps " + " ".join(f"x{i}" for i in range(10)),
    ]
    sf = _write_docs(spark, tmp_path, texts)
    best = _brute_longest_dup(texts)
    want = {d: v for d, v in best.items() if v >= _L}
    got = {
        r.doc_id: r.longest_dup
        for r in dedup_longest_substring(spark, sf).collect()
    }
    assert got == want


def test_lcp_rows_are_exact(spark, tmp_path):
    texts = [
        "a b c d e f g h i j k l m n o p",
        "z z a b c d e f g h i j k l m q r",
    ]
    sf = _write_docs(spark, tmp_path, texts)
    rows = _suffix_lcp(spark, sf).collect()
    # max LCP must be the 13-token shared run "a b ... m"
    assert max(r.lcp for r in rows) == 13


def test_token_bound_fails_loud(spark, tmp_path):
    """A document beyond the 128-token oracle bound must raise, not let
    the SQL side silently drop suffix positions (no-silent-caps rule)."""
    import pytest

    texts = [" ".join(f"w{i}" for i in range(129))]
    sf = _write_docs(spark, tmp_path, texts)
    with pytest.raises(Exception) as ei:
        dedup_longest_substring(spark, sf).collect()
    assert "exceeds the 128-token suffix bound" in str(ei.value)


def test_kmeans_recovers_planted_pairs(spark, tmp_path):
    """8 identical-twin pairs, seeds = vec_id<8: every point must land
    with its twin (n_points=2, inertia 0 per cluster)."""
    from pyspark.sql import Row

    from prometheus_clickhouselog_exporter_spark.workloads.llmdata17 import (
        ml_kmeans_exact,
    )

    rows = []
    for i in range(8):
        base = [float(10 * i + d % 3) for d in range(64)]
        rows.append(Row(vec_id=i, embedding=base, label=i))
        rows.append(Row(vec_id=i + 8, embedding=base, label=i))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    got = ml_kmeans_exact(spark, str(tmp_path)).collect()
    assert len(got) == 8
    assert all(r.n_points == 2 for r in got)
    assert all(r.inertia == 0.0 for r in got)


def test_unbounded_suffix_lcp_matches_bruteforce_on_long_docs(spark, tmp_path):
    """Prefix-doubling path: documents far beyond the registry query's
    128-token bound, with a planted 200-token shared run — exact LCPs
    must match the O(n^2) reference, and the doubling loop must have
    actually extended past its 16-token start cap."""
    from prometheus_clickhouselog_exporter_spark.operators.suffixes import (
        suffix_lcp_unbounded,
    )

    shared = " ".join(f"s{i}" for i in range(200))  # 200-token dup run
    texts = [
        shared + " " + " ".join(f"a{i}" for i in range(150)),
        " ".join(f"b{i}" for i in range(100)) + " " + shared,
        " ".join(f"c{i}" for i in range(300)),  # long, unique
    ]
    sf = _write_docs(spark, tmp_path, texts)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    rows = suffix_lcp_unbounded(docs).collect()
    got_max = max(r.lcp for r in rows)
    best = _brute_longest_dup(texts)
    assert got_max == max(best.values()) == 200
    # per-doc maxima also agree for every doc the brute force flags
    per_doc: dict[int, int] = {}
    for r in rows:
        for d in (r.doc_id, r.pdoc):
            per_doc[d] = max(per_doc.get(d, 0), r.lcp)
    for d, v in best.items():
        if v >= 2:  # bucketed adjacency is exact for LCP >= 2
            assert per_doc[d] == v, (d, per_doc.get(d), v)


def test_unbounded_suffix_fails_loud_past_max_rounds(spark, tmp_path):
    import pytest

    from prometheus_clickhouselog_exporter_spark.operators.suffixes import (
        suffix_lcp_unbounded,
    )

    dup = " ".join(f"w{i}" for i in range(80))
    texts = [dup + " x", dup + " y"]
    sf = _write_docs(spark, tmp_path, texts)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    with pytest.raises(RuntimeError, match="ties persist"):
        suffix_lcp_unbounded(docs, start_cap=4, max_rounds=2)


def test_beam_search_recall_floor(spark):
    """Beam search must beat the one-hop expansion's entry stage and
    hold a pinned recall floor vs brute force at sf0.001."""
    from pyspark.sql import functions as F

    from prometheus_clickhouselog_exporter_spark.operators.similarity import (
        beam_search_topk,
        cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.nbr_id)
        for r in cosine_topk(emb, q, "embedding", "vec_id", "vec_id", k=10).collect()
    }
    got = {
        (r.query_id, r.nbr_id)
        for r in beam_search_topk(
            emb, q, "embedding", "vec_id", "vec_id", k=10
        ).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.7, recall  # measured 0.80
