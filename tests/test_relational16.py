"""Hand-value and invariant tests for relational16 (KS, Spearman,
segment migration)."""

from __future__ import annotations

import numpy as np

from prometheus_clickhouselog_exporter_spark.workloads.relational16 import (
    segment_migration_matrix,
    stats_ks_two_sample,
    stats_spearman_rho,
)

SF_DIR = "/root/testdata/sf0.001"


def test_ks_matches_numpy(spark):
    import duckdb

    en = [r[0] for r in duckdb.sql(
        f"SELECT n_chars FROM '{SF_DIR}/documents.parquet' WHERE lang='en'"
    ).fetchall()]
    zh = [r[0] for r in duckdb.sql(
        f"SELECT n_chars FROM '{SF_DIR}/documents.parquet' WHERE lang='zh'"
    ).fetchall()]
    xs = sorted(set(en) | set(zh))
    n1, n2 = len(en), len(zh)
    en_a, zh_a = np.array(sorted(en)), np.array(sorted(zh))
    best = 0
    for x in xs:
        c1 = int(np.searchsorted(en_a, x, side="right"))
        c2 = int(np.searchsorted(zh_a, x, side="right"))
        best = max(best, abs(c1 * n2 - c2 * n1))
    out = stats_ks_two_sample(spark, SF_DIR).collect()[0]
    assert (out.n1, out.n2) == (n1, n2)
    assert out.d_numerator == best
    assert abs(out.ks_d - best / (n1 * n2)) < 1e-6


def test_spearman_matches_scipy_definition(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT CAST(floor(c.c_acctbal*100) AS BIGINT),
                   coalesce(o.n, 0)
            FROM '{SF_DIR}/customer.parquet' c
            LEFT JOIN (SELECT o_custkey, count(*) n
                       FROM '{SF_DIR}/orders.parquet' GROUP BY 1) o
              ON c.c_custkey = o.o_custkey"""
    ).fetchall()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    y = np.array([r[1] for r in rows], dtype=np.float64)

    def avg_rank(v):
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v))
        sv = v[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + j - 1) / 2 + 1
            i = j
        return ranks

    rx, ry = avg_rank(x), avg_rank(y)
    rho = np.corrcoef(rx, ry)[0, 1]
    out = stats_spearman_rho(spark, SF_DIR).collect()[0]
    assert out.n_obs == len(rows)
    assert abs(out.spearman_rho - rho) < 1e-5


def test_migration_matrix_shares_sum_to_one(spark):
    rows = segment_migration_matrix(spark, SF_DIR).collect()
    assert rows
    by_first: dict[int, float] = {}
    for r in rows:
        assert 1 <= r.q_first <= 4 and 1 <= r.q_second <= 4
        by_first[r.q_first] = by_first.get(r.q_first, 0.0) + r.row_share
    for q, s in by_first.items():
        assert abs(s - 1.0) < 1e-4, (q, s)
    # determinism
    again = segment_migration_matrix(spark, SF_DIR).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
