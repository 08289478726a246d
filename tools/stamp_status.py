"""Driver-stamp debt report: which registry queries have never received
a driver CORRECTNESS stamp, whether the manifest covers them, and what
the next head-50 sample window will contain.

Evidence basis (r11): CORRECTNESS_r01..r10 mapped onto registry
positions shows the driver stamps the HEAD-50 of the order
``__spark_entry__.queries()`` returns, so the head window printed here
IS the expected next sample. Run after adding queries to confirm new
work has not displaced old debt (tests/test_stamp_manifest.py pins the
same invariants in CI).

Usage: python tools/stamp_status.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    import __spark_entry__ as entry
    from prometheus_clickhouselog_exporter_spark.workloads import QUERIES
    from prometheus_clickhouselog_exporter_spark.workloads.stamp_manifest import (
        STAMP_PRIORITY,
    )

    last: dict[str, bool] = {}
    rounds: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rows = json.load(open(path))
        for name, row in rows.items():
            last[name] = (
                row.get("hash_match") is True and row.get("err") is None
            )
            rounds[name] = os.path.basename(path)
    names = list(QUERIES)
    never = [n for n in names if n not in last]
    red = [n for n in names if n in last and not last[n]]
    order = entry._registration_order()
    head = order[:50]
    print(f"registry: {len(names)} queries")
    print(f"stamped green: {sum(1 for n in names if last.get(n))}")
    print(f"stamped red (last stamp): {len(red)} {red}")
    print(f"never stamped: {len(never)}")
    in_manifest = [n for n in never if n in STAMP_PRIORITY]
    outside = [n for n in never if n not in STAMP_PRIORITY]
    print(f"  in manifest: {len(in_manifest)}; outside (new work): {len(outside)}")
    print("next head-50 window composition:")
    print(f"  manifest debt: {sum(1 for n in head if n in STAMP_PRIORITY)}")
    print(f"  new never-stamped: {sum(1 for n in head if n in outside)}")
    print(f"  re-certs (green): {sum(1 for n in head if last.get(n))}")
    drained = [n for n in STAMP_PRIORITY if last.get(n)]
    if drained:
        print(f"manifest entries now green (prunable): {len(drained)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
