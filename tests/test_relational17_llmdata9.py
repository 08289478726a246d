"""Hand-value and invariant tests for relational17 + llmdata9 (BOM
explosion, calendar dim, vocab coverage, dedup-quality impact)."""

from __future__ import annotations

import calendar
import datetime as dt

from prometheus_clickhouselog_exporter_spark.workloads.llmdata9 import (
    curation_dedup_quality_impact,
    text_vocab_coverage_curve,
)
from prometheus_clickhouselog_exporter_spark.workloads.relational17 import (
    gen_calendar_dim,
    recursive_bom_explosion,
)

SF_DIR = "/root/testdata/sf0.001"


def _bom_python(limit=200, roots=range(4)):
    """Independent replay of the synthetic BOM walk."""
    edges: dict[int, list] = {}
    for p in range(limit):
        for child in (2 * p + 1, 2 * p + 2):
            if child < limit:
                edges.setdefault(p, []).append((child, 1 + child % 3))
    out = {}
    for r in roots:
        stack = [(c, q, 1) for c, q in edges.get(r, [])]
        n, maxd, tot = 0, 0, 0
        while stack:
            node, qty, depth = stack.pop()
            n += 1
            maxd = max(maxd, depth)
            tot += qty
            for c, q in edges.get(node, []):
                stack.append((c, qty * q, depth + 1))
        out[r] = (n, maxd, tot)
    return out


def test_bom_matches_python_replay(spark):
    got = {
        r.root: (r.n_components, r.max_depth, r.total_units)
        for r in recursive_bom_explosion(spark, SF_DIR).collect()
    }
    assert got == _bom_python()


def test_calendar_quarters_consistent(spark):
    rows = gen_calendar_dim(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.q <= 4
        assert 1 <= r.n_days <= 92
        # month-end count == months present in this quarter slice
        first = dt.date.fromisoformat(r.first_day)
        last = dt.date.fromisoformat(r.last_day)
        assert first <= last
        assert r.in_leap_year == (1 if calendar.isleap(r.y) else 0)
        # weekend share sane: 2 of 7 days +-boundaries
        assert abs(r.n_weekend - r.n_days * 2 / 7) <= 4


def test_vocab_coverage_monotone_and_bounded(spark):
    rows = text_vocab_coverage_curve(spark, SF_DIR).collect()
    assert [r.vocab_size for r in rows] == [10, 30, 100, 300]
    covs = [r.coverage for r in rows]
    assert all(a <= b for a, b in zip(covs, covs[1:]))
    assert all(0 < c <= 1.0 for c in covs)
    tot = {r.tokens_total for r in rows}
    assert len(tot) == 1
    for r in rows:
        assert r.tokens_covered <= r.tokens_total


def test_dedup_impact_counts_reconcile(spark):
    rows = {r.fate: r for r in curation_dedup_quality_impact(spark, SF_DIR).collect()}
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert rows["kept"].n_docs + rows.get("dropped").n_docs == n_docs
    # keepers are one per group; dropped must be fewer than kept-groups' dups
    assert rows["dropped"].n_docs < n_docs
    assert rows["kept"].mean_chars > 0 and rows["dropped"].mean_chars > 0


def test_audio_vad_round_trip_hand_ids(spark):
    """The VAD chain on real decoded WAVs matches the gating formula
    for hand-checked ids."""
    from prometheus_clickhouselog_exporter_spark.workloads.llmdata9 import (
        multimodal_audio_vad,
    )

    rows = {r.doc_id: r for r in multimodal_audio_vad(spark, SF_DIR).collect()}
    assert len(rows) == 60
    for i in (0, 1, 2, 7):
        active = [(i + b) % 3 != 0 for b in range(10)]
        segs, run, longest, first = 0, 0, 0, -1
        for k, a in enumerate(active):
            if a:
                if run == 0:
                    segs += 1
                run += 1
                longest = max(longest, run)
                if first < 0:
                    first = k
            else:
                run = 0
        r = rows[i]
        assert (r.n_frames, r.n_active, r.n_segments, r.longest_run,
                r.first_active) == (10, sum(active), segs, longest, first)
