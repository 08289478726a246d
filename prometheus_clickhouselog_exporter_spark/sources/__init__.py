from .tables import TABLE_NAMES, load_table, load_tables, register_views
from .logsource import check_log_path, read_log_batch, read_log_stream

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "check_log_path",
    "read_log_batch",
    "read_log_stream",
]
