"""Human-readable byte-size parsing as a pure column expression (no UDF).

Reference C3/C4: ``bytefmt.ToBytes(strings.Join(strings.Fields(s), ""))``
(query.go:150-162, 217-222) — whitespace is stripped, then cloudfoundry/
bytefmt parses ``<float><unit>`` with **1024-based** units for K/M/G/T/P
regardless of spelling (``K``, ``KB``, ``KiB`` all mean 1024). The float is
multiplied and truncated to an integer. Unknown units are a parse error,
which the pipeline turns into a ``convert`` error count + NULL (never an
exception) — matching the reference's count-and-skip contract
(query.go:152-162).

Staying in pure expressions keeps this inside whole-stage codegen; a Python
UDF here would put a serde boundary in the per-line hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# bytefmt multipliers (1024-based, bytefmt.go in cloudfoundry/bytefmt).
_MULTIPLIERS: dict[str, int] = {
    "B": 1,
    "K": 1024,
    "M": 1024**2,
    "G": 1024**3,
    "T": 1024**4,
    "P": 1024**5,
    "E": 1024**6,
}


def parse_bytes(col: Column) -> Column:
    """``"1.00 MiB"`` → ``1048576`` (LongType); NULL when unparseable."""
    # C4: collapse/remove all whitespace first (query.go:150).
    s = F.upper(F.regexp_replace(col, r"\s+", ""))
    num = F.regexp_extract(s, r"^([0-9]*\.?[0-9]+)", 1).try_cast("double")
    unit = F.regexp_extract(s, r"^[0-9]*\.?[0-9]+([A-Z]*)$", 1)
    # bytefmt accepts X, XB, XIB for each prefix letter; bare bytes are B/"".
    prefix = F.when(unit.isin("B", ""), F.lit("B")).otherwise(
        F.when(unit.substr(2, 10).isin("", "B", "IB"), unit.substr(1, 1))
    )
    mult = F.lit(None).cast("long")
    for letter, m in _MULTIPLIERS.items():
        mult = F.when(prefix == letter, F.lit(m)).otherwise(mult)
    # bytefmt truncates the scaled float toward zero (uint64 conversion).
    return F.floor(num * mult).cast("long")
