"""Event-time windowed streaming aggregation with watermarks (SURVEY §2.2
"Streaming windows" + "Watermarks/late-data policy" rows).

The reference has no time-windowed operators (its correlation is ID-keyed);
this is the engine-side generalization: tumbling/sliding window counts over
the parsed event stream, with a watermark bounding state and defining the
late-data contract. Rows later than the watermark are dropped by the engine;
to preserve the reference's "count what you drop" posture (its
not_found_query counter, query.go:190) the pipeline pairs the windowed
aggregate with a side counter of late rows measured against the observed
max event time.

100 TB: watermark + window state is partitioned by (window, extra keys) and
expires as the watermark advances — state size is O(windows in flight), not
O(stream length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "5 minutes",
    extra_keys: tuple[str, ...] = ("event_kind",),
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` differs) windowed counts over
    the parsed log-event stream. Works on streaming and batch inputs —
    batch mode simply ignores the watermark, which is exactly Spark's
    contract."""
    win = F.window(F.col(ts_col), window, slide or window)
    src = events.filter(F.col(ts_col).isNotNull())
    if events.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(win.alias("w"), *extra_keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), *extra_keys, "n")
    )


def windowed_metric_export(
    events: DataFrame,
    path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
    extra_keys: tuple[str, ...] = ("event_kind",),
):
    """Warehouse-friendly metrics: per-window event counts appended to
    parquet as windows close (append mode + watermark ⇒ each window is
    written exactly once, immutable — the alternative to the Prometheus
    sink's accumulate-forever counters when metrics feed a table instead
    of a scrape endpoint). Returns the StreamingQuery."""
    agg = windowed_event_counts(events, ts_col, window, None, watermark, extra_keys)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("windowed_metric_export")
        .start()
    )
