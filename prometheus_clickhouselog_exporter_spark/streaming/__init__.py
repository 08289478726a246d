from .session_state import sessionize_stream, SESSION_OUTPUT_SCHEMA
from .pipeline import run_log_pipeline
from .sink import PrometheusSnapshotSink
from .windows import windowed_event_counts

__all__ = [
    "sessionize_stream",
    "SESSION_OUTPUT_SCHEMA",
    "run_log_pipeline",
    "PrometheusSnapshotSink",
    "windowed_event_counts",
]
