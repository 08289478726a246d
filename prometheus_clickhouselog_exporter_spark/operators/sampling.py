"""Deterministic sampling operators for training-data pipelines
(SURVEY §2.3 extension).

Why not ``df.sample()``: Spark's Bernoulli sampler draws from a per-partition
RNG seeded by (seed, partition index), so the selected rows change with the
physical partitioning — a repartition, AQE coalesce, or input-split change
silently yields a different sample. For dataset curation that is poison: the
sample must be a pure function of the DATA so it is reproducible across
runs, engines, and cluster shapes, and so later pipeline stages (dedup →
sample → filter) can be re-executed incrementally.

The sampler here buckets each row by a content hash (md5 — chosen over
xxhash64 because every engine agrees on md5, making the sample auditable
from DuckDB/Trino/anything) and keeps rows whose bucket falls under the
fraction. Properties:

- deterministic: same key ⇒ same verdict, independent of partitioning;
- consistent across fractions: the kept set at 1% is a subset of the kept
  set at 10% (nested samples for scaling-law runs);
- stratifiable: per-stratum fractions via a CASE over the strata column;
- coordinated: sampling BY A JOIN KEY keeps referential integrity — sample
  users, keep all their documents.

100 TB: a pure scan-stage predicate — no shuffle, no RNG state; Parquet
cannot push an md5 filter, but the scan prunes columns and the filter runs
in the same codegen stage as the read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: buckets per unit of fraction resolution (1e-4 granularity)
BUCKETS = 10_000


def hash_bucket(key: Column, buckets: int = BUCKETS) -> Column:
    """Engine-portable bucket in [0, buckets): first 8 md5 hex chars as an
    integer, mod buckets.

    DuckDB/ANSI equivalent:
    ``CAST(('0x' || substr(md5(key), 1, 8)) AS UBIGINT) % buckets``.
    """
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % buckets


def deterministic_sample(
    df: DataFrame, key: Column | str, fraction: float, buckets: int = BUCKETS
) -> DataFrame:
    """Keep rows whose hash bucket < fraction·buckets (content-addressed
    Bernoulli sample; see module docstring for why not ``df.sample``)."""
    k = F.col(key) if isinstance(key, str) else key
    return df.filter(hash_bucket(k, buckets) < int(round(fraction * buckets)))


def stratified_sample(
    df: DataFrame,
    key: Column | str,
    strata: Column | str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language rebalancing:
    downsample English, keep all low-resource languages).

    ``fractions`` maps stratum value → keep fraction; strata not listed get
    ``default_fraction``. The threshold is a CASE expression, so the whole
    operator is still a single scan-stage predicate.
    """
    k = F.col(key) if isinstance(key, str) else key
    s = F.col(strata) if isinstance(strata, str) else strata
    thr: Column = F.lit(int(round(default_fraction * buckets)))
    for value, frac in sorted(fractions.items()):
        thr = F.when(s == value, F.lit(int(round(frac * buckets)))).otherwise(thr)
    return df.filter(hash_bucket(k, buckets) < thr)
