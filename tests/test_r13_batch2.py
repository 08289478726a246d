"""Round 13 batch 2: BPE apply, categorical association, deltaSum,
Mantel–Haenszel, MCC battery, Self-BLEU — invariants beyond the hash."""

from __future__ import annotations

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_bpe_apply_compression(spark):
    rows = QUERIES["text_bpe_apply_encoding"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_covered <= r.n_occurrences
        # merges only ever shrink token counts below chars, and a token
        # is at least one char: chars/token in [1, max word length]
        assert r.encoded_tokens <= r.covered_chars
        assert 1.0 <= r.chars_per_token <= 16.0


def test_categorical_association_bounds(spark):
    r = QUERIES["clickhouse_categorical_association"](spark, SF_DIR).collect()[0]
    assert r.r >= 2 and r.c >= 2 and r.n > 0
    assert 0.0 <= r.cramers_v <= 1.0
    assert 0.0 <= r.cramers_v_bc <= r.cramers_v + 1e-9  # correction shrinks
    assert 0.0 <= r.theils_u <= 1.0
    assert 0.0 <= r.contingency_c < 1.0
    assert r.chi2 >= 0.0


def test_delta_sum_positive_part(spark):
    rows = QUERIES["clickhouse_delta_sum_moving"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.delta_sum_cents >= 0
        assert 0 <= r.n_drops <= r.n_points - 1
        assert r.last_moving3_cents >= 0


def test_mantel_haenszel_sanity(spark):
    r = QUERIES["stats_mantel_haenszel"](spark, SF_DIR).collect()[0]
    assert r.n_strata == 5  # the five order priorities
    assert r.or_mh > 0.0
    assert r.chi2_cmh >= 0.0
    # segment choice is independent of price on this corpus: OR near 1
    assert 0.2 < r.or_mh < 5.0


def test_mcc_consistency(spark):
    r = QUERIES["ml_mcc_threshold"](spark, SF_DIR).collect()[0]
    n = r.tp + r.fp + r.fn + r.tn
    assert n > 0 and min(r.tp, r.fp, r.fn, r.tn) >= 0
    assert -1.0 <= r.mcc <= 1.0
    assert 0.0 <= r.f1 <= 1.0
    # Youden's J and balanced accuracy are affine twins: J = 2*BA - 1
    assert abs(r.youden_j - (2 * r.balanced_acc - 1)) <= 2e-6
    # p75 cut: roughly a quarter of rows predicted positive
    assert (r.tp + r.fp) <= n // 2


def test_self_bleu_bounds(spark):
    rows = QUERIES["text_self_bleu"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_docs > 0
        assert 0.0 <= r.self_bleu2 <= 1.0
    # the synthetic corpus shares vocabulary across docs: some overlap
    assert max(r.self_bleu2 for r in rows) > 0.0
