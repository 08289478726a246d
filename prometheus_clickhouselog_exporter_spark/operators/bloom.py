"""Pure-expression Bloom filter: distributed bitset build + plan-literal
probe.

This is the manual twin of Spark's injected runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``): build a fixed-size
bitset over a key column with ONE tiny shuffle (``m_bits/64`` groups),
hold the bitmap on the driver (16–512 KiB — same order as Spark's own
InSubquery / bloom runtime-filter results), then embed it as an
array<long> literal so the probe side evaluates entirely in the scan
stage — no shuffle of the probe table at all.

Use case (reference semantics analog: the exporter's dup-session check,
query.go:91-95, generalized to corpus scale): incremental dedup /
contamination checks where a huge new batch is tested against an existing
corpus. The bloom answers "definitely new" scan-side; only the small
candidate set pays an exact verification join.

Everything is codegen-friendly built-in expressions — xxhash64, pmod,
shiftleft/shiftright, bit_or aggregate, element_at on a folded array
literal. No UDFs, no driver-side row loops (the only collect is the
``m_bits/64``-row bitmap, bounded by the filter size, not the data).

ANSI-safe: hashes are folded into 40 bits before the double-hash affine
combine, so ``h1 + i*h2`` stays far below 2^63 (Spark 4 runs ANSI mode ON
and would raise on long overflow).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASK40 = (1 << 40) - 1


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a key via double hashing (Kirsch–Mitzenmacher):
    pos_i = (h1 + i*h2) mod m. Both hashes are xxhash64 (distinct seeds via
    an extra literal column) folded to 40 bits for overflow headroom."""
    h1 = F.pmod(F.xxhash64(key), F.lit(_MASK40))
    h2 = F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)), F.lit(_MASK40))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]


def bloom_build(df: DataFrame, key: Column, m_bits: int = 1 << 20, k: int = 3) -> list[int]:
    """Aggregate a Bloom bitset over ``key`` and return it as a Python list
    of ``m_bits/64`` longs (index = bit position // 64).

    Plan shape: project k positions → explode → groupBy(word) bit_or —
    partial aggregation makes the shuffle ≤ m_bits/64 rows per partition
    regardless of input size. The collect is the bitmap, not the data.
    """
    words = m_bits // 64
    pos = F.explode(F.array(*_positions(key, m_bits, k))).alias("pos")
    agg = (
        df.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.pmod(F.col("pos"), F.lit(64)).cast("int")
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    bitmap = [0] * words
    for row in agg:
        bitmap[row["word"]] = row["bits"]
    return bitmap


def bloom_might_contain(key: Column, bitmap: list[int], m_bits: int, k: int = 3) -> Column:
    """Membership test against a built bitmap, as a pure expression over a
    folded array<long> literal: false ⇒ definitely absent, true ⇒ candidate
    (verify exactly downstream). element_at on the constant-folded literal
    is O(1); the whole predicate runs inside whole-stage codegen in the
    probe table's scan stage."""
    bm = F.lit(bitmap)
    checks = []
    for p in _positions(key, m_bits, k):
        word = F.element_at(bm, F.shiftright(p, 6).cast("int") + F.lit(1))
        shifted = F.call_function("shiftright", word, F.pmod(p, F.lit(64)).cast("int"))
        checks.append(shifted.bitwiseAND(F.lit(1)) == F.lit(1))
    return reduce(lambda a, b: a & b, checks)
