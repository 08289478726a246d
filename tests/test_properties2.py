"""Property-based checks for the r3s5 closed forms — pure-Python
hypothesis sweeps of the window identities the Spark operators rely
on, plus an md5-family cross-check that replays the weighted-MinHash
construction in hashlib and proves the min-merge property. These run
WITHOUT Spark (the identities are what the oracles and operators both
assume; the Spark↔DuckDB agreement is certified by the oracle
harness), so hundreds of examples cost milliseconds."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

# --- clamp-at-zero running balance: level_k = prefix_k - min(0, min_{j<=k} P_j)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60))
def test_clamped_balance_closed_form(deltas):
    level, p, prefixes = 0, 0, []
    for d in deltas:
        level = max(0, level + d)
        p += d
        prefixes.append(p)
        closed = p - min(0, min(prefixes))
        assert closed == level


# --- CUSUM: S_t = P_t - min(0, min_{j<=t} P_j) over (c - k)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=20),
)
def test_cusum_closed_form(counts, kref):
    s, p, prefixes = 0, 0, []
    for c in counts:
        s = max(0, s + c - kref)
        p += c - kref
        prefixes.append(p)
        assert p - min(0, min(prefixes)) == s


# --- KS: integer cross-multiply argmax == float ECDF supremum


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=40),
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=40),
)
def test_ks_cross_multiply_equals_float_sup(xs, ys):
    n1, n2 = len(xs), len(ys)
    support = sorted(set(xs) | set(ys))
    best_int = 0
    best_float = 0.0
    for v in support:
        c1 = sum(1 for x in xs if x <= v)
        c2 = sum(1 for y in ys if y <= v)
        best_int = max(best_int, abs(c1 * n2 - c2 * n1))
        best_float = max(best_float, abs(c1 / n1 - c2 / n2))
    # the integer form identifies the same supremum value
    assert best_int == round(best_float * n1 * n2)


# --- Mann-Whitney doubling: 2*avg tie rank = 2r + c - 1, and U1+U2 = n1*n2


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10), min_size=1, max_size=30),
    st.lists(st.integers(min_value=0, max_value=10), min_size=1, max_size=30),
)
def test_mann_whitney_doubled_ranks(xs, ys):
    pooled = sorted(xs + ys)
    n1, n2 = len(xs), len(ys)

    def r2(v):  # doubled tie-averaged rank
        lo = sum(1 for p in pooled if p < v)  # rank of first tie member - 1
        c = sum(1 for p in pooled if p == v)
        return 2 * (lo + 1) + c - 1

    r1x2 = sum(r2(x) for x in xs)
    u1x2 = r1x2 - n1 * (n1 + 1)
    u1_direct = sum(
        2 if a > b else (1 if a == b else 0) for a in xs for b in ys
    )
    assert u1x2 == u1_direct
    u2x2 = 2 * n1 * n2 - u1x2
    assert u1x2 + u2x2 == 2 * n1 * n2


# --- weighted MinHash: signature of a union is the elementwise min,
#     replayed with the REAL md5 recipe the operators use


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _signature(weights: dict, n_perms=8, cap=4):
    sig = [None] * n_perms
    for tok, w in weights.items():
        for r in range(1, min(w, cap) + 1):
            for perm in range(n_perms):
                h = _md5_long(f"{tok}#{r}#{perm}")
                if sig[perm] is None or h < sig[perm]:
                    sig[perm] = h
    return sig


@settings(max_examples=50, deadline=None)
@given(
    st.dictionaries(st.sampled_from("abcdefgh"), st.integers(1, 6), max_size=6),
    st.dictionaries(st.sampled_from("defghijk"), st.integers(1, 6), max_size=6),
)
def test_weighted_minhash_min_merge(wa, wb):
    if not wa or not wb:
        return
    union = {t: max(wa.get(t, 0), wb.get(t, 0)) for t in set(wa) | set(wb)}
    sa, sb, su = _signature(wa), _signature(wb), _signature(union)
    merged = [min(x, y) for x, y in zip(sa, sb)]
    assert merged == su


# --- Hamming-LSH pigeonhole: distance < n_bands guarantees a shared band


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=(1 << 64) - 1),
    st.sets(st.integers(min_value=0, max_value=63), max_size=3),
)
def test_hamming_band_pigeonhole(h, flip_bits):
    h2 = h
    for b in flip_bits:
        h2 ^= 1 << b
    bands1 = [(h >> (16 * k)) & 0xFFFF for k in range(4)]
    bands2 = [(h2 >> (16 * k)) & 0xFFFF for k in range(4)]
    # <= 3 flipped bits across 4 bands: some band is untouched
    assert any(a == b for a, b in zip(bands1, bands2))
