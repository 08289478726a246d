"""Ad-hoc warm timer for individual registry queries.

Mirrors bench.py's protocol (one untimed warm-up, then min-of-2 timed
passes through the noop sink) for a named subset — the iterate loop of
a constant-factor pass without paying the full headline.

Usage: python tools/time_queries.py [sf_dir] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from prometheus_clickhouselog_exporter_spark.session import get_spark
    from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

    spark = get_spark("time-queries", cores=cpus, shuffle_partitions=cpus)
    for name in args:
        fn = QUERIES[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best or 9e9, time.time() - t0)
        print(f"{name}: {best:.3f}s", flush=True)


if __name__ == "__main__":
    main()
