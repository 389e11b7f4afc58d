"""HyperMinHash (reference hmh.h:34-781; Yoon/Kishore LSH-preserving
HLL+MinHash fusion): one 2^p-register sketch whose registers carry BOTH a
leading-zero count (the HLL half, 6 bits) and an r-bit sub-bucket
remainder from an independent hash (the MinHash half):

    register = max over elements of (lzc << r) | rem        (hmh.h:355-366)
      lzc = clz(((h1 << 1) | 1) << (p - 1)) + 1              (capped 65-p)
      rem = h2 & (2^r - 1)

so the same sketch answers cardinality (Ertl-MLE over the lzc histogram —
estimate_hll_portion, hmh.h:367-375, the reference's own path for
n < 1024·2^p) AND Jaccard: equal nonzero registers collide for shared
elements by MinHash logic, and the r extra mantissa bits push random
collisions down to ~2^-r per filled bucket; the estimator subtracts the
analytically expected random collisions (expected_collisions,
hmh.h:462-489):

    J ≈ max(0, (C - E_C) / N)
      C = #(equal AND nonzero), N = #(nonzero in either)

(Yoon's paper form; the reference's jaccard_index expression at
hmh.h:519-529 multiplies instead of dividing by the same factors — we
follow the paper and test against planted truth.)

Register size rsize ∈ {8,16,32,64} → r = rsize - 6 (q = 6 lzc bits,
hmh.h:70-77).  Merge = element-wise max (commutative monoid), so the build
is the usual two-level partial+final aggregation.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HMH_SEED2 = 0x9E3779B9  # seed for the independent mantissa hash
Q_LZC = 6  # lzc bits per register (hmh.h:70)


def _bit_length_col(x: Column) -> Column:
    """Integer-exact bit_length of a non-negative-interpreted uint64 column
    (32-bit split before log2, as in hll.hll_registers)."""
    hi = F.shiftrightunsigned(x, 32)
    lo = x.bitwiseAND(F.lit(0xFFFFFFFF))
    return (
        F.when(x == 0, F.lit(0))
        .when(hi > 0, F.lit(33) + F.floor(F.log2(hi.cast("double"))).cast("int"))
        .otherwise(F.lit(1) + F.floor(F.log2(lo.cast("double"))).cast("int"))
    )


def hmh_registers(
    elems: DataFrame,
    group_col: str = "g",
    hash_col: str = "h",
    p: int = 10,
    rsize: int = 16,
    hash_bits: int = 64,
    rem_col: str | None = None,
) -> DataFrame:
    """(group, h) -> (group, regs array<long> of 2^p HyperMinHash
    registers).  h must be a well-mixed hash of `hash_bits` bits; the
    mantissa half uses an independent xxhash64 of it, or `rem_col` when
    given (the engine-portable oracle path supplies a second mod-prime
    hash there, so DuckDB can rebuild identical registers).  Empty
    buckets are 0."""
    assert rsize in (8, 16, 32, 64)
    r = rsize - Q_LZC
    m = 1 << p
    rbm = (1 << r) - 1
    h1 = F.col(hash_col)
    if hash_bits == 64:
        bucket = F.shiftrightunsigned(h1, 64 - p)
        # x = ((h1 << 1) | 1) << (p - 1); lzc(x) + 1  (hmh.h:356-358).
        # Shifts are bitwise (ANSI-safe); the |1 guard caps lzc at 65 - p.
        x = F.shiftleft(F.shiftleft(h1, 1).bitwiseOR(F.lit(1)), p - 1)
        lzc = F.lit(64) - _bit_length_col(x) + F.lit(1)
    else:
        # portable sub-64-bit hash (non-negative, < 2^hash_bits): bucket =
        # top p bits, lzc = rho of the remaining vb bits (integer-exact,
        # same arithmetic as hll.hll_registers; rem == 0 caps at vb + 1,
        # matching the reference's |1 guard).
        vb = hash_bits - p
        bucket = F.shiftrightunsigned(h1, vb)
        vbits = h1.bitwiseAND(F.lit((1 << vb) - 1))
        lzc = F.lit(vb) - _bit_length_col(vbits) + F.lit(1)
    rem = (
        F.col(rem_col).bitwiseAND(F.lit(rbm))
        if rem_col is not None
        else F.xxhash64(h1, F.lit(HMH_SEED2)).bitwiseAND(F.lit(rbm))
    )
    reg = F.shiftleft(lzc.cast("long"), r).bitwiseOR(rem)
    per_bucket = (
        elems.select(F.col(group_col).alias("_g"), bucket.alias("bucket"), reg.alias("reg"))
        .groupBy("_g", "bucket")
        .agg(F.max("reg").alias("mx"))
    )
    if m <= 1024:
        # static unroll (codegen), same trade as hll_registers: element_at
        # over a map is a linear scan, so the pivot is O(m^2) per group —
        # measured fine to m = 1024, pathological beyond it
        return (
            per_bucket.groupBy("_g")
            .agg(F.map_from_entries(F.collect_list(F.struct("bucket", "mx"))).alias("mm"))
            .select(
                F.col("_g").alias(group_col),
                F.array(
                    *[
                        F.coalesce(
                            F.element_at(F.col("mm"), F.lit(i).cast("long")),
                            F.lit(0).cast("long"),
                        )
                        for i in range(m)
                    ]
                ).alias("regs"),
            )
        )

    # large m: one Arrow crossing per GROUP row, numpy scatter — O(m) per
    # group (the hll_registers large-p path, same rationale)
    @F.pandas_udf("array<long>")
    def _scatter(buckets: pd.Series, vals: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for b, v in zip(buckets, vals):
            regs = np.zeros(m, dtype=np.int64)
            regs[np.asarray(b, dtype=np.int64)] = np.asarray(v, dtype=np.int64)
            out.append(regs)
        return pd.Series(out)

    return (
        per_bucket.groupBy("_g")
        .agg(
            F.collect_list("bucket").alias("_bk"),
            F.collect_list("mx").alias("_mx"),
        )
        .select(
            F.col("_g").alias(group_col),
            _scatter(F.col("_bk"), F.col("_mx")).alias("regs"),
        )
    )


def hmh_merge_col(a: Column, b: Column) -> Column:
    """Union = element-wise max (hmh.h register monoid)."""
    return F.zip_with(a, b, lambda x, y: F.greatest(x, y))


def hmh_cardinality_udf(
    regs_col: Column, p: int, rsize: int = 16, hash_bits: int = 64
) -> Column:
    """Ertl-MLE over the lzc histogram (estimate_hll_portion,
    hmh.h:367-375).  hash_bits must match the hmh_registers build (the
    reference hardcodes 64; the portable 60-bit oracle tier passes 60 —
    q models the geometric value-bit count, and overstating it biases the
    MLE's tail terms)."""
    from sketch_spark.operators.hll import ertl_ml_estimate

    r = rsize - Q_LZC
    q = hash_bits - p

    @F.pandas_udf("double")
    def est(regs: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for rr in regs:
            lzc = np.asarray(rr, dtype=np.int64) >> r
            counts = np.bincount(lzc, minlength=q + 2)
            out.append(max(ertl_ml_estimate(counts, p, q), 0.0))
        return pd.Series(out, dtype="float64")

    return est(regs_col)


def hmh_cc_nc_cols(a: Column, b: Column) -> tuple[Column, Column]:
    """(C, N): equal-and-nonzero count, nonzero-in-either count
    (__calc_cc_nc, hmh.h:537-548)."""
    cc = F.size(
        F.filter(F.zip_with(a, b, lambda x, y: (x == y) & (x != 0)), lambda v: v)
    )
    nc = F.size(
        F.filter(F.zip_with(a, b, lambda x, y: (x != 0) | (y != 0)), lambda v: v)
    )
    return cc, nc


def hmh_expected_collisions_py(
    n: float, m: float, p: int, rsize: int = 16
) -> float:
    """Expected random register collisions between independent sketches of
    cardinalities n and m (hmh.h:462-489, the HyperMinHash paper's exact
    double sum; ported literally including the trailing x*p + 0.5 and the
    caller's /p, hmh.h:460)."""
    r = rsize - Q_LZC
    if n < m:
        n, m = m, n
    tq = 64
    tr = 1 << r
    x = 0.0

    def incx(b1: float, b2: float) -> float:
        prx = (1.0 - b2) ** n - (1.0 - b1) ** n
        pry = (1.0 - b2) ** m - (1.0 - b1) ** m
        return prx * pry

    for i in range(1, tq):
        di = math.ldexp(1.0, -(p + r + i - 1))
        b1, b2 = 0.0, di
        for _ in range(1, tr + 1):
            b1 += di
            b2 += di
            x += incx(b1, b2)
    di = math.ldexp(1.0, -(p + r + tq))
    b1 = tr * di
    b2 = b1 + di
    for _ in range(tr):
        b1 += di
        b2 += di
        x += incx(b1, b2)
    return (x * p + 0.5) / p


def hmh_jaccard_py(
    cc: int, nc: int, card_a: float, card_b: float, p: int, rsize: int = 16
) -> float:
    """Ĵ = max(0, (C - E_C) / N) (paper form; see module docstring)."""
    if not nc:
        return 0.0
    ec = hmh_expected_collisions_py(card_a, card_b, p, rsize)
    return max(0.0, (cc - ec) / nc)
