"""Pure-expression Bloom filter: distributed bitset build + plan-literal
probe.

This is the manual twin of Spark's injected runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``): build a fixed-size
bitset over a key column with ONE tiny shuffle (``m_bits/64`` groups),
hold the bitmap on the driver (16–512 KiB — same order as Spark's own
InSubquery / bloom runtime-filter results), then embed it as a literal so
the probe side evaluates entirely in the scan stage — no shuffle of the
probe table at all.

Use case (reference semantics analog: the exporter's dup-session check,
query.go:91-95, generalized to corpus scale): incremental dedup /
contamination checks where a huge new batch is tested against an existing
corpus. The bloom answers "definitely new" scan-side; only the small
candidate set pays an exact verification join.

Representation matters twice over: the bitmap crosses into the plan as
ONE flat BINARY literal. Not an array<long> literal — py4j converts
Python lists element-by-element (a 16 K-element ``F.lit(list)`` costs
~12 s to build and seconds more every time the optimizer copies the
tree). And not a hex STRING literal — string ``substring`` scans bytes
up to the offset on every call (UTF8 variable-width handling), making
each probe O(bitmap size); binary slicing is a direct byte-offset copy.
The probe reads a byte with binary substring + ``hex`` + ``conv`` and
tests the bit with shifts — all constant-foldable around the two
data-dependent positions, all inside whole-stage codegen.

ANSI-safe: hashes are folded into 40 bits before the double-hash affine
combine, so ``h1 + i*h2`` stays far below 2^63 (Spark 4 runs ANSI mode ON
and would raise on long overflow).
"""

from __future__ import annotations

import struct
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASK40 = (1 << 40) - 1


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a key via double hashing (Kirsch–Mitzenmacher):
    pos_i = (h1 + i*h2) mod m. Both hashes are xxhash64 (distinct seeds via
    an extra literal column) folded to 40 bits (pmod by 2^40, a power of
    two, so no residue bias) for overflow headroom. h2 is forced ODD
    (2x+1): h2 ≡ 0 mod m would collapse all k probes onto h1, and for the
    power-of-two m_bits defaults odd h2 is coprime with m, guaranteeing k
    distinct positions. Worst case h1 + (k-1)*h2 ≈ k*2^41 ≪ 2^63, safe
    under ANSI overflow checking."""
    h1 = F.pmod(F.xxhash64(key), F.lit(_MASK40 + 1))
    h2 = F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)), F.lit(_MASK40 + 1)) * 2 + 1
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]


def bloom_build(df: DataFrame, key: Column, m_bits: int = 1 << 20, k: int = 3) -> bytes:
    """Aggregate a Bloom bitset over ``key`` and return it as ``m_bits/8``
    bytes (bit i = byte ``i>>3``, LSB-first — i.e. little-endian 64-bit
    words, so word and byte addressing agree).

    Plan shape: project k positions → explode → groupBy(word) bit_or —
    partial aggregation makes the shuffle ≤ m_bits/64 rows per partition
    regardless of input size. The collect is the bitmap, not the data.
    """
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
    words = [0] * (m_bits // 64)
    for row in agg:
        words[row["word"]] = row["bits"]
    return b"".join(struct.pack("<q", w) for w in words)


def bloom_might_contain(key: Column, bitmap: bytes, m_bits: int, k: int = 3) -> Column:
    """Membership test against a built bitmap, as a pure expression over
    the BINARY bitmap literal: false ⇒ definitely absent, true ⇒
    candidate (verify exactly downstream). Byte lookup is a binary
    substring (O(1) byte-offset slice — a hex STRING literal would scan
    to the offset on every row, see operators/lookup.py) + hex + conv;
    the whole predicate runs inside whole-stage codegen in the probe
    table's scan stage."""
    packed = F.lit(bitmap)
    checks = []
    for p in _positions(key, m_bits, k):
        start = (F.shiftright(p, 3) + 1).cast("int")
        byte = F.conv(
            F.hex(F.call_function("substring", packed, start, F.lit(1))), 16, 10
        ).cast("long")
        shifted = F.call_function("shiftright", byte, F.pmod(p, F.lit(8)).cast("int"))
        checks.append(shifted.bitwiseAND(F.lit(1)) == F.lit(1))
    return reduce(lambda a, b: a & b, checks)
