"""Streaming twin of last-touch attribution
(workloads/pipeline_ops4.attribution_last_touch).

Per-user carry-forward state on ``applyInPandasWithState``: every
click/view updates the user's last-touch (channel, ts); every purchase
emits ONE attribution row crediting the state as it stood strictly
before the purchase — or 'direct' when nothing precedes it. For
time-ordered input this reproduces the batch twin's ignore-nulls window
exactly (the fidelity test runs both on the same events and compares the
per-channel rollup), and unlike the batch window it works incrementally:
a click in batch N attributes a purchase in batch N+1 without
reprocessing batch N.

This is the reference correlator's exact state discipline (query.go:
180-230 — stash the opening line's fields, consume them at the closing
line) applied to a marketing/curation timeline instead of a query_id.

100 TB: state is ONE (channel, ts_us) pair per active user — O(active
users), hash-partitioned by user_id; the optional processing-time
timeout evicts dormant users (the same leak fix session_state.py applies
to the reference's unbounded map, main.go:110-129).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ATTRIBUTION_OUTPUT_SCHEMA = (
    "user_id bigint, purchase_ts timestamp, value double, channel string"
)

# last-touch channel + its event time; channel None ⇒ no touch seen yet
_STATE_SCHEMA = "channel string, touch_us bigint"

_TOUCH_TYPES = ("click", "view")


def _fold_attribution(
    rows: list[tuple], state: tuple | None
) -> tuple[list[dict], tuple]:
    """(sorted (ts_us, event_type, event_id, value) rows, state) →
    (attribution rows, new state). Purchases consult the state BEFORE the
    row is applied, so equal-timestamp touches never self-attribute
    (matching the batch twin's 1-PRECEDING frame, which orders ties by
    (ts, event_id) and still excludes the current row)."""
    channel, touch_us = state if state is not None else (None, None)
    out: list[dict] = []
    for ts_us, kind, _event_id, value in rows:
        if kind == "purchase":
            out.append(
                {
                    "ts_us": ts_us,
                    "value": value,
                    "channel": channel if channel is not None else "direct",
                }
            )
        elif kind in _TOUCH_TYPES:
            channel, touch_us = kind, ts_us
    return out, (channel, touch_us)


def attribution_stream(events: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """events (user_id, ts, event_type, event_id, value) → one row per
    purchase with its attributed channel, incrementally."""

    def func(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        user_id = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        ev = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
        ts_us = ev["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        # sort key must be (ts, event_id) — the batch twin's window order —
        # never the tuple's natural order, which would compare event_type
        # strings at equal timestamps and diverge from the batch rollup
        rows = sorted(
            zip(
                ts_us.tolist(),
                ev["event_type"].tolist(),
                ev["event_id"].tolist(),
                ev["value"].tolist(),
            ),
            key=lambda r: (r[0], r[2]),
        )
        prev = tuple(state.get) if state.exists else None
        out, new_state = _fold_attribution(rows, prev)
        state.update(new_state)
        if timeout_ms > 0:
            state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out),
                    "purchase_ts": [pd.Timestamp(o["ts_us"], unit="us") for o in out],
                    "value": [o["value"] for o in out],
                    "channel": [o["channel"] for o in out],
                }
            )

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "ts", "event_type", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            func, ATTRIBUTION_OUTPUT_SCHEMA, _STATE_SCHEMA, "append", timeout_conf
        )
    )
