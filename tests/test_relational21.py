"""Hand-value tests for relational21 (k-core peel, Friedman)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from prometheus_clickhouselog_exporter_spark.workloads.relational21 import (
    graph_kcore_peel,
    stats_friedman_quarters,
)

SF_DIR = "/root/testdata/sf0.001"


def test_kcore_hand_graph(spark, tmp_path):
    """K4 clique + a tendril: the clique survives 3-core peeling, the
    tendril (and the node it hangs off keeps degree>=3) — classic."""
    # orders as hyperedges: one order per graph edge (2 parts each)
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]  # clique on 1-4
    tendril = [(4, 5), (5, 6)]  # 5,6 peel away; 4 keeps clique degree 3
    rows, okey = [], 0
    for a, b in k4 + tendril:
        for p in (a, b):
            rows.append(Row(l_orderkey=okey, l_partkey=p, l_suppkey=1,
                            l_linenumber=p, l_quantity=1.0,
                            l_extendedprice=1.0, l_discount=0.0, l_tax=0.0,
                            l_returnflag="N", l_linestatus="O",
                            l_shipdate=dt.datetime(2024, 1, 1)))
        okey += 1
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/lineitem.parquet")
    out = {r.round: r for r in graph_kcore_peel(spark, str(tmp_path)).collect()}
    assert out[0].n_nodes == 6
    # SIMULTANEOUS peel: round 1 removes 6 (deg 1) AND 5 (deg 2) together;
    # the K4 clique is stable from round 1 on
    assert out[1].n_nodes == 4
    assert out[2].n_nodes == 4 and out[3].n_nodes == 4 and out[4].n_nodes == 4
    assert out[4].converged


def test_friedman_zero_when_quarters_identical(spark, tmp_path):
    """Identical per-quarter spend for every customer -> all ranks tie
    -> Q == 0."""
    rows, okey = [], 0
    for cust in range(12):
        for q_month in (2, 5, 8, 11):
            rows.append(Row(o_orderkey=okey, o_custkey=cust,
                            o_orderstatus="F", o_totalprice=500.0,
                            o_orderdate=dt.datetime(2024, q_month, 15),
                            o_orderpriority="1-URGENT"))
            okey += 1
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/orders.parquet")
    out = stats_friedman_quarters(spark, str(tmp_path)).collect()[0]
    assert out.n_subjects == 12
    # tied quadruple: each doubled rank is 2*1 + 4 - 1 = 5 -> sums equal
    assert out.r1_x2 == out.r2_x2 == out.r3_x2 == out.r4_x2 == 12 * 5
    assert out.friedman_q == 0.0


def test_friedman_detects_dominant_quarter(spark, tmp_path):
    """Q4 always largest -> its rank sum is maximal and Q > critical."""
    rows, okey = [], 0
    for cust in range(12):
        for i, q_month in enumerate((2, 5, 8, 11)):
            amt = 100.0 + 10 * i + (1000.0 if q_month == 11 else 0.0)
            rows.append(Row(o_orderkey=okey, o_custkey=cust,
                            o_orderstatus="F", o_totalprice=amt,
                            o_orderdate=dt.datetime(2024, q_month, 15),
                            o_orderpriority="1-URGENT"))
            okey += 1
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/orders.parquet")
    out = stats_friedman_quarters(spark, str(tmp_path)).collect()[0]
    # strictly increasing quarters: doubled ranks 2,4,6,8 per customer
    assert (out.r1_x2, out.r2_x2, out.r3_x2, out.r4_x2) == (
        12 * 2, 12 * 4, 12 * 6, 12 * 8)
    # perfect ordering: Q = 3/(n*k*(k+1)) * sum R'^2 - 3n(k+1) = 9n/... > 7.8
    assert out.friedman_q > 7.81  # chi2(3) 95% critical value


def test_nemenyi_consistent_with_friedman(spark, tmp_path):
    """With one dominant quarter (relational21's dominant test corpus),
    the dominant quarter's pairs must be the significant ones."""
    from prometheus_clickhouselog_exporter_spark.workloads.relational22 import (
        stats_nemenyi_posthoc,
    )

    rows, okey = [], 0
    for cust in range(20):
        for i, q_month in enumerate((2, 5, 8, 11)):
            amt = 100.0 + i + (5000.0 if q_month == 11 else 0.0)
            rows.append(Row(o_orderkey=okey, o_custkey=cust,
                            o_orderstatus="F", o_totalprice=amt,
                            o_orderdate=dt.datetime(2024, q_month, 15),
                            o_orderpriority="1-URGENT"))
            okey += 1
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/orders.parquet")
    out = stats_nemenyi_posthoc(spark, str(tmp_path)).collect()
    assert len(out) == 6
    # Q4 vs Q1 has the largest mean-rank gap (3.0) and must be significant
    q14 = next(r for r in out if r.q_a == 1 and r.q_b == 4)
    assert q14.mean_rank_diff == 3.0 and q14.significant
    # adjacent early quarters differ by 1 rank: gap 1.0
    q12 = next(r for r in out if r.q_a == 1 and r.q_b == 2)
    assert q12.mean_rank_diff == 1.0


def test_theil_sen_per_key_recovers_distinct_slopes(spark, tmp_path):
    from prometheus_clickhouselog_exporter_spark.workloads.relational22 import (
        stats_theil_sen_per_key,
    )

    rows, okey = [], 0
    for prio, slope in [("1-URGENT", 100.0), ("2-HIGH", -50.0)]:
        for m in range(10):
            rows.append(Row(o_orderkey=okey, o_custkey=1, o_orderstatus="F",
                            o_totalprice=5000.0 + slope * m,
                            o_orderdate=dt.datetime(2024, 1 + m, 5),
                            o_orderpriority=prio))
            okey += 1
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/orders.parquet")
    got = {r.priority: r.theil_sen_slope
           for r in stats_theil_sen_per_key(spark, str(tmp_path)).collect()}
    assert got == {"1-URGENT": 100.0, "2-HIGH": -50.0}


def test_ks_per_source_matches_scipy_style_replay(spark):
    """Each source's D equals a direct one-vs-rest ECDF computation."""
    import numpy as np
    from prometheus_clickhouselog_exporter_spark.workloads.relational22 import (
        stats_ks_per_source,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    by_src: dict[str, list] = {}
    for d in docs:
        by_src.setdefault(d.source, []).append(d.n_chars)
    all_vals = sorted(v for vs in by_src.values() for v in vs)
    got = {r.source: (r.n_source, r.d_numerator)
           for r in stats_ks_per_source(spark, SF_DIR).collect()}
    for src, vals in by_src.items():
        rest = sorted(v for s2, vs in by_src.items() if s2 != src for v in vs)
        ns, nr = len(vals), len(rest)
        sv = np.array(sorted(vals))
        rv = np.array(rest)
        best = 0
        for x in sorted(set(all_vals)):
            cs = int(np.searchsorted(sv, x, side="right"))
            cr = int(np.searchsorted(rv, x, side="right"))
            best = max(best, abs(cs * nr - cr * ns))
        assert got[src] == (ns, best), src


def test_lorenz_monotone_convex_and_reconciles(spark):
    from prometheus_clickhouselog_exporter_spark.workloads.relational22 import (
        stats_lorenz_deciles,
    )

    rows = stats_lorenz_deciles(spark, SF_DIR).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    shares = [r.cum_share for r in rows]
    assert all(a < b for a, b in zip(shares, shares[1:]))  # monotone
    assert abs(shares[-1] - 1.0) < 1e-6
    # convexity of the Lorenz curve: increments increase with decile
    incs = [shares[0]] + [b - a for a, b in zip(shares, shares[1:])]
    assert all(a <= b + 1e-9 for a, b in zip(incs, incs[1:]))


def test_mcnemar_hand_corpus(spark, tmp_path):
    from prometheus_clickhouselog_exporter_spark.workloads.relational22 import (
        stats_mcnemar_halves,
    )

    lo, hi = dt.datetime(2024, 1, 1), dt.datetime(2024, 12, 31)
    custs = [Row(c_custkey=i, c_name=f"c{i}", c_nationkey=0,
                 c_acctbal=1.0, c_mktsegment="X") for i in range(6)]
    orders = []
    okey = 0
    # cust 0: both halves; cust 1,2: H1 only (churned); cust 3: H2 only
    plan = {0: [lo, hi], 1: [lo], 2: [lo], 3: [hi], 4: [], 5: []}
    for cust, dates in plan.items():
        for ts in dates:
            orders.append(Row(o_orderkey=okey, o_custkey=cust,
                              o_orderstatus="F", o_totalprice=10.0,
                              o_orderdate=ts, o_orderpriority="1-URGENT"))
            okey += 1
    spark.createDataFrame(custs).write.parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(orders).write.parquet(f"{tmp_path}/orders.parquet")
    out = stats_mcnemar_halves(spark, str(tmp_path)).collect()[0]
    assert (out.n_both, out.n_churned, out.n_acquired, out.n_never) == (1, 2, 1, 2)
    assert abs(out.mcnemar_chi2 - (2 - 1) ** 2 / 3) < 1e-6
