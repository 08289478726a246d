from .session_state import sessionize_stream, SESSION_OUTPUT_SCHEMA
from .pipeline import run_log_pipeline
from .sink import PrometheusSnapshotSink

__all__ = [
    "sessionize_stream",
    "SESSION_OUTPUT_SCHEMA",
    "run_log_pipeline",
    "PrometheusSnapshotSink",
]
