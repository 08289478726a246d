"""CLI — the Spark rendering of the reference's binary (main.go:70-145).

    python -m prometheus_clickhouselog_exporter_spark LOGPATH \
        [--from-start] [--listen 0.0.0.0:19901] [--checkpoint DIR] \
        [--session-timeout-ms N] [--batch] [--max-files-per-trigger N] \
        [--sink-path DIR]

Flag parity with the reference:
- ``LOGPATH``          — required positional, file or directory (main.go:21)
- ``--from-start``     — read from the beginning (main.go:19). Spark terms:
                         wipe/ignore the checkpoint so offsets restart; the
                         default resumes from the checkpoint, which
                         generalizes the reference's seek-to-end.
- ``--listen``         — /metrics pull endpoint (main.go:20), serving the
                         Prometheus text exposition of the snapshot sink.
Engine-specific additions: ``--batch`` one-shot mode (scan the log, print
the exposition, exit — handy for backfills), ``--checkpoint``,
``--session-timeout-ms`` (bounds the state the reference leaks, SURVEY ST5),
``--sink-path`` (append completed sessions as parquet — the K1 "TODO: send
info about query" the reference never implemented, main.go:126).
"""

from __future__ import annotations

import argparse
import shutil
import signal
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def make_metrics_server(sink, host: str, port: int) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            if self.path.rstrip("/") in ("", "/metrics"):
                body = sink.render_exposition().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def log_message(self, *args):  # quiet
            pass

    return ThreadingHTTPServer((host, port), Handler)


def run_cli(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="prometheus-clickhouselog-exporter-spark")
    p.add_argument("logpath", help="ClickHouse log file or directory")
    p.add_argument("--from-start", action="store_true", help="process from the beginning (reset offsets)")
    p.add_argument("--listen", default="0.0.0.0:19901", help="host:port for /metrics")
    p.add_argument("--no-listen", action="store_true", help="disable the HTTP endpoint")
    p.add_argument("--checkpoint", default="/tmp/chlog-spark-checkpoint")
    p.add_argument("--session-timeout-ms", type=int, default=3_600_000)
    p.add_argument("--batch", action="store_true", help="one-shot batch over the log, print metrics, exit")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--sink-path", default=None, help="parquet dir for completed session records")
    args = p.parse_args(argv)

    from .session import get_spark
    from .sources.logsource import check_log_path

    check_log_path(args.logpath)  # S3 pre-flight (main.go:81-85)
    spark = get_spark("chlog-exporter")

    if args.batch:
        return _run_batch(spark, args)
    return _run_stream(spark, args)


def _run_batch(spark, args) -> int:
    from .operators.correlate import correlate_batch
    from .operators.metrics import metric_snapshot
    from .operators.parsing import parse_log_lines
    from .sources.logsource import read_log_batch
    from .streaming.sink import PrometheusSnapshotSink

    raw = read_log_batch(spark, args.logpath)
    parsed = parse_log_lines(raw).cache()
    sink = PrometheusSnapshotSink()
    sink.load_metric_frames(metric_snapshot(raw, parsed))
    if args.sink_path:
        correlate_batch(parsed).filter("full_info").write.mode("append").parquet(args.sink_path)
    sys.stdout.write(sink.render_exposition())
    return 0


def _run_stream(spark, args) -> int:
    from .streaming.pipeline import run_log_pipeline
    from .streaming.sink import PrometheusSnapshotSink

    if args.from_start:
        shutil.rmtree(args.checkpoint, ignore_errors=True)

    sink = PrometheusSnapshotSink(session_parquet_path=args.sink_path)
    pipe = run_log_pipeline(
        spark,
        args.logpath,
        args.checkpoint,
        sink,
        timeout_ms=args.session_timeout_ms,
        max_files_per_trigger=args.max_files_per_trigger,
    )

    server = None
    if not args.no_listen:
        host, port = args.listen.rsplit(":", 1)
        server = make_metrics_server(sink, host, int(port))
        threading.Thread(target=server.serve_forever, daemon=True).start()
        print(f"serving /metrics on {args.listen}", file=sys.stderr)

    stop = threading.Event()

    def _sig(*_):  # K2 graceful shutdown (main.go:130-142)
        stop.set()

    signal.signal(signal.SIGINT, _sig)
    signal.signal(signal.SIGTERM, _sig)
    try:
        while not stop.is_set():
            stop.wait(1.0)
    finally:
        pipe.stop()
        if server:
            server.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(run_cli(sys.argv[1:]))
