"""Round 10 batch 10: Quade test, PromQL offset/@, Ledoit-Wolf, chrF,
distinct-n, TF-IDF cosine pairs — semantic invariants beyond the hash
gate."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_quade_statistic_structure(spark):
    r = QUERIES["stats_quade_test"](spark, SF_DIR).collect()[0]
    assert r.n_blocks > 0
    # B <= A always (Cauchy-Schwarz over the S_ij decomposition)
    assert r.b_stat <= r.a_stat + 1e-9
    if r.f_quade is not None:
        assert r.f_quade >= 0.0


def test_offset_modifier_calendar_identity(spark):
    rows = QUERIES["promql_offset_atmodifier"](spark, SF_DIR).collect()
    assert rows
    by_series: dict[str, list] = {}
    for r in rows:
        by_series.setdefault(r.event_type, []).append(r)
    for series_rows in by_series.values():
        series_rows.sort(key=lambda r: r.eval_hr)
        # @ end() is constant per series
        assert len({r.inc6h_at_end for r in series_rows}) == 1
        # offset identity: inc6h_offset_24h(t) == inc6h(t-24) where both emitted
        by_hr = {r.eval_hr: r for r in series_rows}
        for r in series_rows:
            prev = by_hr.get(r.eval_hr - 24)
            if prev is not None:
                assert r.inc6h_offset_24h == prev.inc6h
        assert r.day_over_day_cents == r.inc6h - r.inc6h_offset_24h


def test_ledoit_wolf_bounds(spark):
    r = QUERIES["embedding_ledoit_wolf"](spark, SF_DIR).collect()[0]
    assert r.d == 64 and r.n > 0
    assert 0.0 <= r.lambda_star <= 1.0
    assert r.bbar2 >= 0.0 and r.dbar2 > 0.0
    assert r.mu > 0.0  # trace of a Gram matrix


def test_chrf_self_and_disjoint_pairs(spark):
    docs = [
        (0, "abcdefgh", "en", "s", 8),
        (1, "abcdefgh", "en", "s", 8),  # identical -> P = R = 1 -> F2 = 1
        (2, "aaaaaa", "de", "s", 6),
        (3, "zzzzzz", "de", "s", 6),  # disjoint -> 0
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        out = {r.lang: r for r in QUERIES["eval_chrf_pairs"](spark, td).collect()}
    assert abs(out["en"].avg_chrf3 - 1.0) < 1e-9
    assert out["de"].avg_chrf3 == 0.0


def test_distinct_n_monotone(spark):
    rows = QUERIES["text_distinct_n"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # higher-order grams are strictly more diverse on natural text
        assert 0.0 < r.distinct1 <= r.distinct2 <= r.distinct3 <= 1.0


def test_tfidf_cosine_planted_near_dup(spark):
    rows = QUERIES["dedup_tfidf_cosine_pairs"](spark, SF_DIR).collect()
    assert all(0.2 - 1e-9 <= r.cosine <= 1.0 + 1e-9 for r in rows)
    # planted: doc B = doc A with one token changed -> cosine near 1
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (100, base, "en", "s", len(base)),
        (101, base.replace("kappa", "omega"), "en", "s", len(base)),
        (102, "one two three four five six seven eight nine ten", "en", "s", 49),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        out = QUERIES["dedup_tfidf_cosine_pairs"](spark, td).collect()
    pairs = {(r.id_a, r.id_b): r.cosine for r in out}
    # with N = 3 the shared shingles carry idf ln(3/2) vs ln(3) for the
    # uniques, so the planted pair lands ~0.49 — well above the floor,
    # far above any cross pair (which shares nothing)
    assert (100, 101) in pairs and pairs[(100, 101)] > 0.4
    assert (100, 102) not in pairs and (101, 102) not in pairs
