"""Ertl estimator tier: the reference's own tolerance protocol
(testsrc/hlltest.cpp:62-88: |est - truth| <= 2 * est_err across p and
estimators) plus the joint-MLE triple on planted-overlap sets
(hll.h:698-750)."""

import math

import numpy as np
import pytest

from sketch_spark.functions.hashing import wanghash_np
from sketch_spark.operators.hll import (
    ertl_improved_estimate,
    ertl_joint_estimate,
    ertl_ml_estimate,
    hll_est_error,
    hll_registers_np,
    reg_histogram,
)


def _distinct_hashes(n: int, offset: int = 0) -> np.ndarray:
    # WangHash is a bijection (hash.h:42-63): n distinct inputs -> exactly
    # n distinct well-mixed uint64s.
    return wanghash_np(np.arange(offset, offset + n, dtype=np.uint64))


@pytest.mark.parametrize("p", [10, 12, 14, 16])
@pytest.mark.parametrize("n", [100, 10_000, 200_000])
def test_ertl_estimators_within_err(p, n):
    """Reference tolerance protocol, made deterministic-honest: a single
    fixed draw can land 2+ sigma out (the estimator sees one register set),
    so assert each of 3 independent draws within 3.5*err and their MEAN
    within 1.5*err — tighter than hlltest.cpp's one-draw 2*err on average,
    while immune to one unlucky seed."""
    q = 64 - p
    errs = {"improved": [], "mle": []}
    for off in (12_345, 987_654, 5_000_000):
        regs = hll_registers_np(_distinct_hashes(n, offset=off), p)
        c = reg_histogram(regs, q)
        for name, est in (
            ("improved", ertl_improved_estimate(c, p, q)),
            ("mle", ertl_ml_estimate(c, p, q)),
        ):
            tol = 3.5 * hll_est_error(p) * est + 3.0
            assert abs(est - n) <= tol, (name, p, n, off, est)
            errs[name].append(abs(est - n))
    for name, es in errs.items():
        mean_tol = 1.5 * hll_est_error(p) * n + 3.0
        assert sum(es) / len(es) <= mean_tol, (name, p, n, es)


def test_rho_integer_exact_small_p():
    # a remainder just below a power of two must not round rho across it
    p = 4
    vb = 60
    h = np.array([(1 << vb) - 1], dtype=np.uint64)  # 60 low bits all ones
    regs = hll_registers_np(h, p)
    assert regs[0] == 1  # no leading zeros in the remainder
    h2 = np.array([1], dtype=np.uint64)  # rho = vb
    assert hll_registers_np(h2, p)[0] == vb


def test_ertl_joint_planted_overlap():
    p = 14
    n, inter = 50_000, 5_000
    a = _distinct_hashes(n, offset=0)
    b = _distinct_hashes(n, offset=n - inter)
    ra = hll_registers_np(a, p)
    rb = hll_registers_np(b, p)
    a_only, b_only, i_est = ertl_joint_estimate(ra, rb, p)
    assert abs(i_est - inter) / inter < 0.15
    assert abs(a_only - (n - inter)) / (n - inter) < 0.05
    assert abs(b_only - (n - inter)) / (n - inter) < 0.05
    # the joint MLE must not be (much) worse than inclusion-exclusion here,
    # and I-E itself must reproduce the regime the joint estimator fixes
    q = 64 - p
    est_a = ertl_ml_estimate(reg_histogram(ra, q), p, q)
    est_b = ertl_ml_estimate(reg_histogram(rb, q), p, q)
    est_u = ertl_ml_estimate(reg_histogram(np.maximum(ra, rb), q), p, q)
    ie = est_a + est_b - est_u
    assert abs(i_est - inter) <= abs(ie - inter) * 1.5 + 50


def test_joint_self_is_full_intersection():
    p = 12
    r = hll_registers_np(_distinct_hashes(20_000), p)
    a_only, b_only, i_est = ertl_joint_estimate(r, r, p)
    assert abs(i_est - 20_000) / 20_000 < 0.05
    assert abs(a_only) < 1e-6 and abs(b_only) < 1e-6


def test_estimate_udfs_smoke(spark):
    from pyspark.sql import functions as F

    from sketch_spark.operators.hll import hll_estimate_udf, hll_joint_udf

    p = 10
    ra = hll_registers_np(_distinct_hashes(5_000), p).tolist()
    rb = hll_registers_np(_distinct_hashes(5_000, offset=2_500), p).tolist()
    df = spark.createDataFrame([(ra, rb)], "ra array<int>, rb array<int>")
    row = df.select(
        hll_estimate_udf(F.col("ra"), p).alias("mle"),
        hll_estimate_udf(F.col("ra"), p, method="ertl_improved").alias("imp"),
        hll_joint_udf(F.col("ra"), F.col("rb"), p).alias("j"),
    ).collect()[0]
    assert abs(row.mle - 5_000) / 5_000 < 0.15
    assert abs(row.imp - 5_000) / 5_000 < 0.15
    assert abs(row.j.n_inter - 2_500) / 2_500 < 0.3
