"""Round 7 batch 5: temporal reachability, quantile normalization,
Neyman allocation, WOE/IV, ZCA whitening."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_temporal_reachability_monotone_arrivals(spark):
    """Hops are time-respecting: every reached user's first_arrival is
    at or after SOME seed's anchor, and hop counts are 0/1/2 with
    seeds exactly the user_id % 10 == 0 signup users."""
    rows = QUERIES["graph_temporal_reachability"](spark, SF_DIR).collect()
    assert rows
    seeds = {r.user_id for r in rows if r.min_hops == 0}
    assert seeds and all(u % 10 == 0 for u in seeds)
    assert {r.min_hops for r in rows} <= {0, 1, 2}
    anchor = min(r.first_arrival for r in rows if r.min_hops == 0)
    for r in rows:
        if r.min_hops > 0:
            assert r.first_arrival > anchor


def test_quantile_normalize_equalizes_distributions(spark):
    """After normalization every source's value multiset must draw from
    the pooled values, preserve per-source ordering, and bring the
    per-source means far closer together than the raw ones."""
    rows = QUERIES["quantile_normalize_doclen"](spark, SF_DIR).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    raw_means = {}
    norm_means = {}
    for s, rs in by_src.items():
        raw_means[s] = sum(x.n_chars for x in rs) / len(rs)
        norm_means[s] = sum(x.normalized_chars for x in rs) / len(rs)
        # monotone: sort by raw length → normalized lengths nondecreasing
        srt = sorted(rs, key=lambda x: (x.n_chars, x.doc_id))
        norm_seq = [x.normalized_chars for x in srt]
        assert norm_seq == sorted(norm_seq)
    raw_spread = max(raw_means.values()) - min(raw_means.values())
    norm_spread = max(norm_means.values()) - min(norm_means.values())
    assert norm_spread <= raw_spread


def test_neyman_beats_proportional_shape(spark):
    rows = QUERIES["sample_neyman_allocation"](spark, SF_DIR).collect()
    assert len(rows) >= 2
    assert all(r.sigma > 0 for r in rows)
    # budget approximately preserved by both allocations (rounding +-k)
    assert abs(sum(r.n_neyman for r in rows) - 100) <= len(rows)
    assert abs(sum(r.n_proportional for r in rows) - 100) <= len(rows)


def test_woe_iv_identities(spark):
    rows = QUERIES["ml_woe_iv_binning"](spark, SF_DIR).collect()
    assert len(rows) == 10
    # IV contributions are non-negative by construction (x-y)ln(x/y) >= 0
    assert all(r.iv_contrib >= 0 for r in rows)
    # WOE sign agrees with good-share vs bad-share direction
    tg = sum(r.n_good for r in rows)
    tb = sum(r.n_bad for r in rows)
    for r in rows:
        gs = (r.n_good + 0.5) / (tg + 0.5)
        bs = (r.n_bad + 0.5) / (tb + 0.5)
        assert (r.woe >= 0) == (gs >= bs)


def test_zca_whitening_certificate(spark):
    rows = QUERIES["embedding_zca_whitening"](spark, SF_DIR).collect()
    assert len(rows) == 64
    assert all(r.diag_within_eps and r.offdiag_within_eps for r in rows)
