"""Hypothesis property tests over the pure kernels — the reference's
invariant-test style (mhtest.cpp merge equivalence, hlltest.cpp estimator
laws) generalized from fixed fixtures to generated inputs.  Everything here
is numpy/python (no SparkSession), so hundreds of examples run in seconds;
Spark-side parity with these kernels is pinned by the deterministic tests.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sketch_spark.functions.hashing import (
    murfinhash_np,
    murfinhash_py,
    wanghash_inv_np,
    wanghash_np,
)
from sketch_spark.operators.hll import hll_registers_np
from sketch_spark.operators.minhash import (
    EMPTY_REG,
    bottomk_jaccard_py,
    densify_batch,
    prob_jaccard_py,
    weighted_jaccard_py,
)

u64s = st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=1, max_size=200)


# -- hash family ------------------------------------------------------------


@given(u64s)
def test_wanghash_is_a_bijection(xs):
    a = np.array(xs, dtype=np.uint64)
    assert np.array_equal(wanghash_inv_np(wanghash_np(a)), a)
    assert np.array_equal(wanghash_np(wanghash_inv_np(a)), a)


@given(u64s)
def test_murfinhash_np_matches_scalar(xs):
    a = np.array(xs, dtype=np.uint64)
    got = murfinhash_np(a)
    assert [int(v) for v in got] == [murfinhash_py(int(x)) for x in xs]


# -- HLL register build: commutative monoid ----------------------------------


@given(u64s, u64s, st.integers(min_value=4, max_value=12))
def test_hll_registers_merge_law(xs, ys, p):
    """regs(A ∪stream B) == elementwise max(regs(A), regs(B)) — the property
    that makes the build a Spark partial+final aggregation (hll.h:1018)."""
    both = hll_registers_np(xs + ys, p)
    merged = np.maximum(hll_registers_np(xs, p), hll_registers_np(ys, p))
    assert np.array_equal(both, merged)


@given(u64s, st.randoms(use_true_random=False), st.integers(min_value=4, max_value=12))
def test_hll_registers_order_invariant(xs, rnd, p):
    shuffled = list(xs)
    rnd.shuffle(shuffled)
    assert np.array_equal(hll_registers_np(xs, p), hll_registers_np(shuffled, p))


# -- optimal densification ----------------------------------------------------


def _regs_from_sets(sets, m):
    mat = np.full((len(sets), m), EMPTY_REG, dtype=np.int64)
    for i, s in enumerate(sets):
        for h in s:
            b = h % m
            v = h // m
            mat[i, b] = min(mat[i, b], v)
    return mat


@given(st.lists(st.sets(st.integers(min_value=0, max_value=1 << 40),
                        min_size=0, max_size=30),
                min_size=1, max_size=8),
       st.sampled_from([8, 16, 32]))
def test_densify_fills_from_occupied_and_is_set_deterministic(sets, m):
    mat = _regs_from_sets(sets, m)
    empty = mat == EMPTY_REG
    out = densify_batch(mat, empty, m)
    for i, s in enumerate(sets):
        occ = mat[i][~empty[i]]
        if len(occ) == 0:
            # all-empty rows are left as-is (callers null them out)
            assert (out[i] == EMPTY_REG).all()
            continue
        # occupied registers never change; empties are copies of occupied
        assert np.array_equal(out[i][~empty[i]], mat[i][~empty[i]])
        assert np.isin(out[i][empty[i]], occ).all()
    # equal sets -> equal densified signatures (bbmh.h:31-56 determinism)
    dup = densify_batch(mat.copy(), empty.copy(), m)
    assert np.array_equal(out, dup)


# -- bottom-k first-k-of-union walk -------------------------------------------


@given(st.sets(st.integers(min_value=0, max_value=1 << 20), max_size=60),
       st.sets(st.integers(min_value=0, max_value=1 << 20), max_size=60),
       st.integers(min_value=1, max_value=32))
def test_bottomk_walk_bounds_and_exact_regime(a, b, k):
    a, b = sorted(a), sorted(b)
    j = bottomk_jaccard_py(a, b, k)
    assert 0.0 <= j <= 1.0
    assert abs(bottomk_jaccard_py(a, b, k) - bottomk_jaccard_py(b, a, k)) == 0.0
    if a:
        assert bottomk_jaccard_py(a, a, k) == 1.0
    union = set(a) | set(b)
    if union and k >= len(union):
        exact = len(set(a) & set(b)) / len(union)
        assert abs(j - exact) < 1e-12


# -- weighted Jaccard oracles --------------------------------------------------

weighted = st.dictionaries(st.integers(min_value=0, max_value=1 << 30),
                           st.integers(min_value=1, max_value=50),
                           min_size=1, max_size=20)


@given(weighted, weighted)
@settings(max_examples=60)
def test_weighted_jaccard_properties(da, db):
    a, b = list(da.items()), list(db.items())
    j = weighted_jaccard_py(a, b)
    assert 0.0 <= j <= 1.0
    assert weighted_jaccard_py(a, a) == 1.0
    assert weighted_jaccard_py(a, b) == weighted_jaccard_py(b, a)
    # scaling both multisets by c leaves sum(min)/sum(max) unchanged
    c = 3
    assert abs(weighted_jaccard_py([(h, c * w) for h, w in a],
                                   [(h, c * w) for h, w in b]) - j) < 1e-12


@given(weighted, weighted)
@settings(max_examples=60)
def test_prob_jaccard_bounds_and_disjoint(da, db):
    a, b = list(da.items()), list(db.items())
    jp = prob_jaccard_py(a, b)
    assert -1e-9 <= jp <= 1.0 + 1e-9  # float summation can graze 1.0
    assert abs(prob_jaccard_py(a, a) - 1.0) < 1e-12
    if not (set(da) & set(db)):
        assert jp == 0.0
    # J_P is bounded above by weighted Jaccard only in the uniform case;
    # the universal law is symmetry:
    assert abs(jp - prob_jaccard_py(b, a)) < 1e-12
