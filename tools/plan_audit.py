"""Plan audit: build every registered query's physical plan and flag
scale smells — a single table scanned many times (the no-ReusedExchange
recompute trap, SCALE.md), nested-loop/cartesian joins, and row-at-a-time
Python evaluation.

Usage: python tools/plan_audit.py [sf_dir] [name ...]
Prints one line per query: scans-per-table, exchange count, join kinds,
and a FLAG column when a smell triggers. Exit 0 always (reporting tool).
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:]

    from prometheus_clickhouselog_exporter_spark.session import get_spark
    from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

    spark = get_spark("plan_audit", cores=8, shuffle_partitions=8)
    targets = names or sorted(QUERIES)
    flagged = 0
    for name in targets:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - reporting tool
            print(f"{name}: BUILD-ERROR {type(e).__name__}: {e}")
            continue
        tables = Counter(
            m.group(1)
            for m in re.finditer(r"file:[^\]]*/(\w+)\.parquet", plan)
        )
        smells = []
        worst = max(tables.values(), default=0)
        if worst >= 3:
            smells.append(f"rescan x{worst}")
        if "CartesianProduct" in plan:
            smells.append("cartesian")
        if "BroadcastNestedLoopJoin" in plan and "CartesianProduct" not in plan:
            # broadcast-NL against a 1-row side is fine; flag only big sides
            if plan.count("BroadcastNestedLoopJoin") > 1:
                smells.append("multi-BNLJ")
        if "BatchEvalPython" in plan:
            smells.append("row-python")
        scans = ",".join(f"{t}x{c}" for t, c in sorted(tables.items()) if c > 1)
        flag = " FLAG[" + ";".join(smells) + "]" if smells else ""
        if smells:
            flagged += 1
        print(
            f"{name}: exch={plan.count('Exchange')} "
            f"rescans=({scans or '-'}){flag}"
        )
    print(f"# flagged: {flagged}/{len(targets)}")


if __name__ == "__main__":
    main()
