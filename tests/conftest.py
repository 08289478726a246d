from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prometheus_clickhouselog_exporter_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", cores=4, shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def fixture_log(tmp_path_factory):
    from prometheus_clickhouselog_exporter_spark.sources.fixtures import standard_corpus

    path = tmp_path_factory.mktemp("logs") / "clickhouse-server.log"
    standard_corpus().write(str(path))
    return str(path)
