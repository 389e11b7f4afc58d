"""SetSketch family (reference setsketch.h:274-976; Ertl arXiv:2101.00314).

The reference's newest estimator family: one sketch that serves both
cardinality and similarity.  Semantics re-expressed Spark-first:

  * CSetSketch (continuous, setsketch.h:274-569): register i = min over
    elements e of x_i(e) with x_i(e) ~ Exp(1) derived deterministically
    from (element hash, i) — the reference's exponential-spacings +
    Fisher-Yates walk (setsketch.h:367-430) is an O(1)-amortized sequential
    construction of exactly this distribution; a vectorized numpy batch
    computes the same min-of-exponentials directly (m x k matrix per
    group), which is the right shape for Arrow.  Shared randomness means
    equal sets give bit-equal registers, so:
      - cardinality = m / sum(registers)          (setsketch.h:554-562)
      - jaccard     = #equal registers / m        (setsketch.h:453-456)
      - alpha/beta/mu triple -> union, intersection, containment
        (setsketch.h:529-573): alpha = frac(a_i > b_i), beta = frac(a_i <
        b_i), union = (cardA + cardB) / (2 - alpha - beta), intersection =
        (1 - alpha - beta) * union.
  * SetSketch (quantized, setsketch.h:674-976 via to_setsketch,
    setsketch.h:324-333): K_i = clamp(1 - log(x_i / a) / log(b), 0, q+1)
    — b-spaced log quantization so a uint8/uint16 register preserves the
    estimators; defaults mirror ss.cpp:68-75,118-124 (b=1.09, a=.08 for
    8-bit; b=1.0006, a=.001 for 16-bit).
  * jmle (setsketch.h:91-115 jmle_simple): one-parameter maximum-likelihood
    Jaccard from the (gt, lt, eq) counts + cardinalities, solved by a
    bounded golden-section minimizer (the reference uses Brent).

Like every sketch here, registers form a commutative monoid (element-wise
min), so the build is a partial+final aggregate and merge == union.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sketch_spark.functions.hashing import wanghash_np

DEFAULT_M = 64
_GOLDEN = 0x9E3779B97F4A7C15

# quantization defaults (ss.cpp:68-75,118-124)
B8, A8, Q8 = 1.09, 0.08, 254
B16, A16, Q16 = 1.0006, 0.001, 65534


def optimal_ab(maxv: float, minv: float, *, q: float) -> tuple[float, float]:
    """Fit SetSketch quantization parameters (a, b) so that register value
    maxv maps to 0 and minv maps to q (reference
    python/sketch_ds/__init__.py:21-36).  The engine's quantizer (module
    header; setsketch_quantize_col) is K(x) = clamp(1 - log_b(x / a), 0,
    q+1); with b = (maxv/minv)^(1/q) and a = maxv / b,
    K(maxv) = 1 - log_b(b) = 0 and K(minv) = log_b(maxv/minv) = q, so the
    dynamic range [minv, maxv] exactly fills the q+1 levels.  Anyone whose
    expected
    per-register exponential draws fall outside the pinned B16/A16 range
    (cardinalities far from the defaults' design point) refits with this.
    Returns (a, b)."""
    if maxv < minv:
        minv, maxv = maxv, minv
    if minv <= 0 or q <= 0:
        raise ValueError("optimal_ab requires positive minv and q")
    b = math.exp(math.log(maxv / minv) / q)
    return maxv / b, b


def _exp_draws(hs: np.ndarray, m: int) -> np.ndarray:
    """(k,) element hashes -> (k, m) Exp(1) draws, deterministic in
    (element, register)."""
    js = np.arange(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        mixed = wanghash_np(hs[:, None].astype(np.uint64) + np.uint64(_GOLDEN) * js)
    u = (mixed.astype(np.float64) + 1.0) / 18446744073709551616.0  # (0, 1]
    return -np.log(u)


def cset_sketch_np(
    df: DataFrame,
    arr_col: str = "shingles",
    id_col: str = "conv_id",
    m: int = DEFAULT_M,
    out_col: str = "cset",
) -> DataFrame:
    """(id, array<long> element hashes) -> (id, cset array<double> of m
    min-of-exponential registers).  Empty/null -> null."""
    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches):
        for pdf in batches:
            out = []
            for arr in pdf[arr_col]:
                if arr is None or len(arr) == 0:
                    out.append(None)
                    continue
                hs = np.asarray(arr, dtype=np.int64)
                out.append(_exp_draws(hs, m).min(axis=0).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], out_col: out})

    return df.select(id_col, arr_col).mapInPandas(
        gen, schema=f"{id_col} {id_type}, {out_col} array<double>"
    )


def cset_registers_py(hashes, m: int = DEFAULT_M) -> np.ndarray:
    """numpy oracle for tests (same construction as cset_sketch_np)."""
    return _exp_draws(np.asarray(hashes, dtype=np.int64), m).min(axis=0)


def cset_merge_col(a: Column, b: Column) -> Column:
    """Union of sketches = element-wise min (the commutative monoid)."""
    return F.zip_with(a, b, lambda x, y: F.least(x, y))


def cset_cardinality_col(regs: Column, m: int) -> Column:
    """m / sum(registers) (setsketch.h:554-562)."""
    s = F.aggregate(regs, F.lit(0.0), lambda acc, v: acc + v)
    return F.when(s > 0, F.lit(float(m)) / s)


def cset_jaccard_col(a: Column, b: Column, m: int) -> Column:
    """Equal-register fraction (setsketch.h:453-456); exact float equality
    is meaningful because randomness is shared.  Delegates to the shared
    §2.6 comparison kernel (functions/arrays.py) — one implementation to
    fix for e.g. null-element handling."""
    from sketch_spark.functions.arrays import count_eq_col

    return count_eq_col(a, b).cast("double") / F.lit(float(m))


def cset_alpha_beta_cols(a: Column, b: Column, m: int) -> tuple[Column, Column]:
    """(frac a_i > b_i, frac a_i < b_i) — count_gtlt (setsketch.h:529-534),
    via the shared kernel in functions/arrays.py."""
    from sketch_spark.functions.arrays import count_gtlt_col

    gl = count_gtlt_col(a, b)
    return (
        gl.getField("n_gt").cast("double") / F.lit(float(m)),
        gl.getField("n_lt").cast("double") / F.lit(float(m)),
    )


def cset_union_intersection_cols(
    a: Column, b: Column, m: int
) -> tuple[Column, Column]:
    """alpha_beta_mu-derived union and intersection sizes
    (setsketch.h:536-573)."""
    alpha, beta = cset_alpha_beta_cols(a, b, m)
    ca = cset_cardinality_col(a, m)
    cb = cset_cardinality_col(b, m)
    union = F.greatest((ca + cb) / (F.lit(2.0) - alpha - beta), F.lit(0.0))
    inter = F.greatest(F.lit(1.0) - alpha - beta, F.lit(0.0)) * union
    return union, inter


def setsketch_quantize_col(
    regs: Column, b: float = B16, a: float = A16, q: int = Q16
) -> Column:
    """Continuous -> quantized registers (to_setsketch, setsketch.h:324-333):
    K = clamp(int(1 - log(x / a) / log(b)), 0, q + 1)."""
    logb_inv = 1.0 / math.log(b)
    return F.transform(
        regs,
        lambda x: F.greatest(
            F.lit(0).cast("long"),
            F.least(
                F.lit(q + 1).cast("long"),
                F.floor(F.lit(1.0) - F.log(x / F.lit(a)) * F.lit(logb_inv)).cast(
                    "long"
                ),
            ),
        ),
    )


def setsketch_cardinality_col(
    kregs: Column, m: int, b: float = B16, a: float = A16
) -> Column:
    """Quantized-register cardinality (SetSketch paper eq. 6):
    est = m * (1 - 1/b) / (a * ln b * sum b^-K)."""
    s = F.aggregate(
        kregs, F.lit(0.0), lambda acc, k: acc + F.pow(F.lit(b), -k.cast("double"))
    )
    const = m * (1.0 - 1.0 / b) / (a * math.log(b))
    return F.when(s > 0, F.lit(const) / s)


def setsketch_merge_col(ka: Column, kb: Column) -> Column:
    """Quantized-register union = element-wise MAX (setsketch.h:769-771 —
    larger K corresponds to a smaller continuous race value)."""
    return F.zip_with(ka, kb, lambda x, y: F.greatest(x, y))


def setsketch_union_size_col(
    ka: Column, kb: Column, m: int, b: float = B16, a: float = A16
) -> Column:
    """num / harmean(max-merged registers) (setsketch.h:759-762)."""
    return setsketch_cardinality_col(setsketch_merge_col(ka, kb), m, b, a)


def setsketch_jaccard_by_ix_col(
    ka: Column, kb: Column, m: int, b: float = B16, a: float = A16
) -> Column:
    """(cardA + cardB - union) / union (setsketch.h:754-758)."""
    us = setsketch_union_size_col(ka, kb, m, b, a)
    ca = setsketch_cardinality_col(ka, m, b, a)
    cb = setsketch_cardinality_col(kb, m, b, a)
    return F.greatest((ca + cb - us) / us, F.lit(0.0))


def _golden_minimize(f, lo: float, hi: float, iters: int = 60) -> float:
    gr = (math.sqrt(5.0) - 1.0) / 2.0
    c = hi - gr * (hi - lo)
    d = lo + gr * (hi - lo)
    fc, fd = f(c), f(d)
    for _ in range(iters):
        if fc < fd:
            hi, d, fd = d, c, fc
            c = hi - gr * (hi - lo)
            fc = f(c)
        else:
            lo, c, fc = c, d, fd
            d = lo + gr * (hi - lo)
            fd = f(d)
    return (lo + hi) / 2.0


def jmle_jaccard_py(
    gt: int, lt: int, m: int, card_a: float, card_b: float, b: float
) -> float:
    """ML Jaccard from (gt, lt) register comparisons + cardinalities
    (reference jmle_simple, setsketch.h:91-115)."""
    if not card_a and not card_b:
        return 0.0
    neq = m - (gt + lt)
    sumest = card_a + card_b
    bi = 1.0 / b
    lbi = 1.0 / math.log(b)
    z = (1.0 - bi) / sumest

    def nll(j: float) -> float:
        lhs = lbi * math.log1p((card_b * j - card_a) * z) if (neq or gt) else 0.0
        rhs = lbi * math.log1p((card_a * j - card_b) * z) if (neq or lt) else 0.0
        ret = 0.0
        try:
            if neq:
                ret += neq * math.log1p(lhs + rhs)
            if gt:
                ret += gt * math.log(-lhs)
            if lt:
                ret += lt * math.log(-rhs)
        except ValueError:
            return float("inf")
        if math.isnan(ret):
            return float("inf")
        return -ret

    hi = min(card_a, card_b) / max(card_a, card_b)
    return _golden_minimize(nll, 0.0, hi)
