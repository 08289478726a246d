"""Compare two BENCH_r*.json files on their COMMON query subset —
the per-round regression review in one command (the judge and the
builder both re-derive this by hand each round otherwise).

Usage: python tools/bench_diff.py BENCH_r03.json BENCH_r04.json [top_n]
Prints the common-subset totals, the per-query deltas sorted worst
first, and the queries unique to each side. Exit 0 always (report).
"""

from __future__ import annotations

import json
import sys


def _queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver-recorded shape
        d = d["parsed"]
    return d["queries"]


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(0)
    a_path, b_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    a, b = _queries(a_path), _queries(b_path)
    common = sorted(set(a) & set(b))
    ta, tb = sum(a[k] for k in common), sum(b[k] for k in common)
    pct = f" ({(tb / ta - 1) * 100:+.1f}%)" if ta > 0 else ""
    print(
        f"common subset ({len(common)} queries): "
        f"{a_path}={ta:.2f}s  {b_path}={tb:.2f}s  "
        f"delta={tb - ta:+.2f}s{pct}"
    )
    deltas = sorted(((b[k] - a[k], k) for k in common), reverse=True)
    print(f"worst {top_n} regressions:")
    for d, k in deltas[:top_n]:
        print(f"  {k}: {a[k]:.3f}s -> {b[k]:.3f}s ({d:+.3f}s)")
    print(f"best {top_n} improvements:")
    for d, k in sorted(deltas)[:top_n]:
        print(f"  {k}: {a[k]:.3f}s -> {b[k]:.3f}s ({d:+.3f}s)")
    only_a, only_b = sorted(set(a) - set(b)), sorted(set(b) - set(a))
    if only_a:
        print(f"only in {a_path}: {', '.join(only_a)}")
    if only_b:
        print(
            f"only in {b_path}: "
            + ", ".join(f"{k} ({b[k]:.3f}s)" for k in only_b)
        )


if __name__ == "__main__":
    main()
