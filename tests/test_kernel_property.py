"""Property-based tests for the pure sketch/ranking kernels — no Ray
session needed: these pin the mathematical contracts (weight
conservation, error bounds, merge associativity, zero false negatives)
on randomized inputs, beyond what the fixed-fixture tests cover."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


# -- t-digest ----------------------------------------------------------------

_value_lists = st.lists(
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=2000)


@settings(max_examples=30, deadline=None)
@given(_value_lists)
def test_tdigest_conserves_weight_and_bounds_size(vals):
    from rdfx_ray.functions.sketch import _td_compress

    v = np.asarray(vals, dtype=np.float64)
    m, w = _td_compress(v, np.ones(len(v)), delta=100.0)
    assert w.sum() == len(v)                     # lossless counts
    assert len(m) <= max(2 * 100, 1)             # ~delta centroids
    assert (np.diff(m) >= -1e-9).all()           # sorted means
    assert v.min() - 1e-9 <= m.min() and m.max() <= v.max() + 1e-9


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(min_value=0, max_value=1e4,
                          allow_nan=False, allow_infinity=False),
                min_size=50, max_size=2000),
       st.integers(min_value=2, max_value=5))
def test_tdigest_merge_any_split_same_error_bound(vals, n_parts):
    """Merging per-part digests estimates the median within the same
    loose bound as a single-pass digest — the mergeability contract
    the distributed groupby relies on."""
    from rdfx_ray.functions.sketch import _td_compress, _td_quantile

    v = np.asarray(vals, dtype=np.float64)
    parts = np.array_split(v, n_parts)
    ms, ws = [], []
    for p in parts:
        if len(p) == 0:
            continue
        m, w = _td_compress(p, np.ones(len(p)), delta=200.0)
        ms.append(m)
        ws.append(w)
    m, w = _td_compress(np.concatenate(ms), np.concatenate(ws),
                        delta=200.0)
    est = _td_quantile(m, w, 0.5, float(v.min()), float(v.max()))
    lo, hi = np.percentile(v, [35, 65])
    assert lo - 1e-6 <= est <= hi + 1e-6


# -- bloom filter ------------------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=-2**62, max_value=2**62),
                min_size=1, max_size=3000, unique=True))
def test_bloom_never_false_negative(members):
    from rdfx_ray.functions.sketch import _bloom_hashes, bloom_contains

    m_bits, k = 1 << 15, 5
    mem = np.asarray(members, dtype=np.int64)
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    pos = _bloom_hashes(mem, m_bits, k).ravel()
    np.bitwise_or.at(bits, pos >> 3,
                     np.uint8(1) << (pos & 7).astype(np.uint8))
    assert bloom_contains(bits, mem, m_bits, k).all()


# -- exact integer percentile rank (the oracle-pinned index math) ------------

@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1, max_value=100_000),
       st.integers(min_value=1, max_value=100))
def test_percentile_disc_rank_integer_math(n, q_pct):
    """The exact-integer rank -(-(q·n)//100) - 1 equals DuckDB's
    percentile_disc rank ceil(q·n) - 1 computed without float error."""
    import math

    from fractions import Fraction
    idx = -(-(q_pct * n) // 100) - 1
    want = math.ceil(Fraction(q_pct, 100) * n) - 1
    assert idx == want
    assert 0 <= idx < n
