"""Driver-built integer arrays as PLAN LITERALS, py4j-safely.

The trap (measured, see SCALE.md): ``F.lit(python_list)`` converts
element-by-element through py4j — ~0.7 ms per element, so a few thousand
entries cost seconds at DataFrame-construction time, every invocation,
before any Spark job runs. The fix mirrors ``operators/bloom.py``: pack
the array into ONE flat hex string (a single py4j transfer, a single
reference in generated code) and index it with substring+conv — both
whole-stage-codegen expressions.

Use for small driver-computed lookup tables that must be evaluated
scan-side with zero joins: bucket-summary prefix sums (distributed
searchsorted), histogram bin offsets, per-partition row offsets. The
table size must be bounded by something structural (a value range, a
partition count), never by the data.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column
from pyspark.sql import functions as F


def packed_lookup(values: list[int], idx: Column) -> Column:
    """``values[idx]`` as a pure expression over a packed BINARY literal.

    Binary, not a hex STRING: ``substring`` on a string literal scans
    bytes up to the offset on every call (UTF8 variable-width handling),
    turning each row's lookup into O(table size) — measured 160 s for a
    56 k-entry table probed 100 k times. Binary slicing is a direct
    byte-offset copy, O(1), and hex() of the 8-byte slice feeds conv.

    Values must be non-negative and < 2^63 (big-endian 8-byte packing).
    ``idx`` must already be clamped to [0, len(values)); out-of-range
    reads return garbage, not an error — clamp with greatest/least at
    the call site.
    """
    packed = F.lit(b"".join(struct.pack(">q", v) for v in values))
    start = (idx.cast("long") * 8 + 1).cast("int")
    return F.conv(F.hex(F.call_function("substring", packed, start, F.lit(8))), 16, 10).cast(
        "long"
    )
