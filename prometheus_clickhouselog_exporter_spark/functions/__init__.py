from .bytesize import parse_bytes
from .stmt import classify_statement
from .histogram import prometheus_histogram

__all__ = ["parse_bytes", "classify_statement", "prometheus_histogram"]
