"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``prometheus_clickhouselog_exporter_spark/``; this
module only adapts the workload registry to the driver's shape.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from prometheus_clickhouselog_exporter_spark.workloads import ORACLE, QUERIES


def _registration_order() -> list[str]:
    """Order queries so the least-verified register first.

    The driver samples a subset of the registry per round; if that sample is
    order-dependent, queries that have never received a green driver stamp
    (or whose last stamp was a FAIL) should be first in line. Priority:
    0 = appeared but last stamp not hash-green — including rows whose last
    stamp carried ``err`` (e.g. the formerly rows-only ``no_oracle`` ANN /
    sketch entries: every registry query now has a DuckDB oracle, so any
    stamp short of a value-hash match should be re-certified first),
    1 = never appeared in any CORRECTNESS_r*.json, 2 = hash-green on the
    most recent stamp. Ties keep registry insertion order, so this is a
    stable re-sort, never a filter.
    """
    last: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        try:
            rows = json.load(open(path))
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            last[name] = row.get("hash_match") is True and row.get("err") is None
    rank = {name: i for i, name in enumerate(QUERIES)}

    def prio(name: str) -> tuple[int, int]:
        if name not in last:
            p = 1
        elif not last[name]:
            p = 0
        else:
            p = 2
        return (p, rank[name])

    return sorted(QUERIES, key=prio)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name] for name in _registration_order()}


def oracle_sql() -> dict[str, str]:
    order = _registration_order()
    return {name: ORACLE[name] for name in order if name in ORACLE}
