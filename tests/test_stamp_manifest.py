"""The driver-stamp drain mechanism (VERDICT r10 #1, r11 #1).

CORRECTNESS_r01..r11.json mapped onto registry positions shows the
driver stamps the HEAD-50 of the order ``__spark_entry__.queries()``
returns, so this ordering IS the sampling policy.  These tests pin the
round-12 manifest mechanics: the never-stamped pool is ordered by the
static ``STAMP_PRIORITY`` list (pruned at r12 start to exactly the 30
queries no driver round has ever sampled — 17 late-r10 registrations,
then the 13 round-11 additions), and any future never-stamped name not
in the manifest ranks after every manifest entry.
"""

from __future__ import annotations

import glob
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import __spark_entry__ as entrymod
from prometheus_clickhouselog_exporter_spark.workloads import ORACLE, QUERIES
from prometheus_clickhouselog_exporter_spark.workloads.stamp_manifest import (
    STAMP_PRIORITY,
)


def _stamped_names() -> set[str]:
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        seen.update(json.load(open(path)))
    return seen


def test_manifest_names_all_registered():
    missing = [n for n in STAMP_PRIORITY if n not in QUERIES]
    assert missing == [], f"manifest names absent from registry: {missing}"


def test_manifest_has_no_duplicates():
    assert len(STAMP_PRIORITY) == len(set(STAMP_PRIORITY))


def test_manifest_covers_exactly_the_never_stamped_pool():
    """As of round 12's start: 30 never-stamped queries, all in the manifest.

    If a future round's CORRECTNESS file stamps some of these green they
    stay harmlessly in the manifest (priority 2 sorts them by registry
    order regardless); what must never happen is a never-stamped query
    missing from BOTH the manifest and the stamped set while older debt
    exists behind it — that is the r10 failure mode.
    """
    stamped = _stamped_names()
    never = [n for n in QUERIES if n not in stamped]
    not_in_manifest = [n for n in never if n not in STAMP_PRIORITY]
    # New queries added in round 11+ are allowed to be outside the manifest
    # only because they rank AFTER every manifest entry (tested below).
    order = entrymod._registration_order()
    idx = {n: i for i, n in enumerate(order)}
    max_manifest_never = max(
        (idx[n] for n in STAMP_PRIORITY if n in never), default=-1
    )
    for n in not_in_manifest:
        assert idx[n] > max_manifest_never, (
            f"never-stamped {n} outside the manifest ranks before manifest "
            "debt — new work is displacing old debt again"
        )


def test_never_stamped_head_is_manifest_order():
    stamped = _stamped_names()
    order = entrymod._registration_order()
    expected_head = [n for n in STAMP_PRIORITY if n not in stamped]
    assert order[: len(expected_head)] == expected_head


def test_head_50_drains_oldest_debt_first():
    """At r12 start the head-50 must contain every manifest entry that is
    still unstamped (all 30 of them) — the driver's next stamp window.
    Registry growth this round must stay small enough that this holds."""
    stamped = _stamped_names()
    order = entrymod._registration_order()
    unstamped_old = [n for n in STAMP_PRIORITY if n not in stamped]
    head = set(order[:50])
    assert all(n in head for n in unstamped_old), (
        "an unstamped manifest query fell outside the driver's head-50 window"
    )


def test_red_stamps_still_outrank_manifest():
    """Priority 0 (last stamp not green) must precede even manifest debt."""
    order = entrymod._registration_order()
    last: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(path)).items():
            last[name] = row.get("hash_match") is True and row.get("err") is None
    reds = [n for n, ok in last.items() if not ok and n in QUERIES]
    idx = {n: i for i, n in enumerate(order)}
    first_manifest = min(
        (idx[n] for n in STAMP_PRIORITY if n not in last), default=len(order)
    )
    for n in reds:
        assert idx[n] < first_manifest


def test_every_query_has_oracle_and_order_is_complete():
    order = entrymod._registration_order()
    assert sorted(order) == sorted(QUERIES)
    assert set(ORACLE) <= set(QUERIES)
