"""State-store observability (r7 verdict stretch #8): every stateful
streaming shape the engine uses must EMIT the state-store metrics an
operator watches at 100 TB (numRowsTotal / memoryUsedBytes, plus the
provider's customMetrics such as loadedMapCacheHitCount on the default
HDFS-backed provider). The fidelity harness harvests the last
progress's stateOperators into workloads.llmdata11.STATE_METRICS; this
suite runs one representative fidelity query per stateful shape and
pins that the metrics arrive with sane values."""

from __future__ import annotations

import pytest

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES
from prometheus_clickhouselog_exporter_spark.workloads.llmdata11 import (
    STATE_METRICS,
)

SF_DIR = "/root/testdata/sf0.001"

# one representative per stateful physical shape; operatorName fragments
# per the Spark state-operator taxonomy
SHAPES = [
    ("streaming_cusum_fidelity", "applyInPandasWithState"),
    ("streaming_sliding_window_fidelity", "stateStoreSave"),
    ("streaming_interval_join_fidelity", "symmetricHashJoin"),
    ("streaming_dedup_fidelity", "dedupe"),
    ("streaming_native_session_fidelity", "sessionWindowStateStoreSave"),
]


@pytest.mark.parametrize("qname,op_fragment", SHAPES)
def test_stateful_shape_emits_state_metrics(spark, qname, op_fragment):
    before = set(STATE_METRICS)
    QUERIES[qname](spark, SF_DIR).collect()
    new = [ops for k, ops in STATE_METRICS.items() if k not in before]
    assert new, f"{qname}: no stateOperators harvested"
    flat = [so for ops in new for so in ops]
    named = [so for so in flat if op_fragment in (so["operatorName"] or "")]
    assert named, (
        f"{qname}: no operator matching {op_fragment!r} in "
        f"{[so['operatorName'] for so in flat]}"
    )
    for so in named:
        assert so["numRowsTotal"] > 0, so
        assert so["memoryUsedBytes"] > 0, so
        # default provider surfaces its map-cache counters; RocksDB
        # surfaces rocksdb* — either way customMetrics must be present
        assert isinstance(so["customMetrics"], dict) and so["customMetrics"], so
        keys = set(so["customMetrics"])
        assert any(
            "loadedMapCache" in k or k.startswith("rocksdb") for k in keys
        ), keys
