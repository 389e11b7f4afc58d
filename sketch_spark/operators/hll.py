"""HyperLogLog: register-exact sketch aggregation + estimators.

Two tiers (SURVEY.md §2.3):
  * metrics tier — Spark's builtin `approx_count_distinct` (HLL++), used
    wherever only the number matters;
  * register-exact tier — this module: 2^p uint8 registers built with the
    same semantics as the reference (hll.h:886-899: idx = top p bits,
    register = max(clz(remaining) + 1)), merged element-wise max
    (hll.h:1018-1045), with the original Flajolet-Durand estimator +
    linear-counting small-range correction (hll.h:211-238) and the
    inclusion-exclusion set-algebra surface (hll.h:1188-1252).

Plan shape: one groupBy(group, bucket) max-agg (partial+final, map-side
combine) then a groupBy(group) pivot-to-array — the same two-level monoid
aggregation as the MinHash builders.  Estimation is a JVM higher-order
expression; no Python anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_P = 12


def _alpha(m: int) -> float:
    # bias constant (hll.h uses the standard Flajolet values)
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    elems: DataFrame,
    group_col: str = "g",
    hash_col: str = "h",
    p: int = DEFAULT_P,
    hash_bits: int = 64,
) -> DataFrame:
    """(group, h) -> (group, regs array<int> of length 2^p).

    h must be a well-mixed hash of `hash_bits` bits (default: full-range
    64-bit xxhash64; for hash_bits < 64 the value must be non-negative and
    < 2^hash_bits — e.g. the engine-portable 60-bit mod-prime hash of the
    oracle tier).  Register value = 1 + #leading-zeros of the low
    hash_bits-p bits (capped at hash_bits-p+1), i.e. the reference's
    clz(remaining)+1 (hll.h:886-899), computed with integer-exact
    arithmetic.
    """
    m = 1 << p
    vb = hash_bits - p
    assert vb >= 1
    mask = (1 << vb) - 1
    rem = F.col(hash_col).bitwiseAND(F.lit(mask))
    # rho = vb - floor(log2(rem)) for rem>0 else vb+1.  floor(log2(double))
    # is only exact below 2^53, so split rem into 32-bit halves: each half
    # is < 2^32 and exactly representable — integer-exact rho for every p
    # (a direct log2 on a 57-bit value can round across a power of two and
    # produce an off-by-one rho).
    hi = F.shiftrightunsigned(rem, 32)
    lo = rem.bitwiseAND(F.lit(0xFFFFFFFF))
    rho = (
        F.when(rem == 0, F.lit(vb + 1))
        .when(hi > 0, F.lit(vb - 32) - F.floor(F.log2(hi.cast("double"))).cast("int"))
        .otherwise(F.lit(vb) - F.floor(F.log2(lo.cast("double"))).cast("int"))
    )
    per_bucket = (
        elems.select(
            F.col(group_col).alias("_g"),
            F.shiftrightunsigned(F.col(hash_col), vb).alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("_g", "bucket")
        .agg(F.max("rho").alias("mx"))
    )
    return (
        per_bucket.groupBy("_g")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("bucket", "mx"))).alias("mm")
        )
        .select(
            F.col("_g").alias(group_col),
            # static unroll (codegen) instead of interpreted transform()
            F.array(
                *[
                    F.coalesce(
                        F.element_at(F.col("mm"), F.lit(i).cast("long")), F.lit(0)
                    )
                    for i in range(m)
                ]
            ).alias("regs"),
        )
    )


def hll_merge(hlls: DataFrame, group_col: str, regs_col: str = "regs") -> DataFrame:
    """Union of sketches = element-wise max (hll.h:1018-1045); an aggregate
    over zip_with-reduce, exploiting the commutative monoid."""
    return hlls.groupBy(group_col).agg(
        F.reduce(
            F.collect_list(regs_col),
            F.array().cast("array<int>"),
            lambda acc, r: F.when(F.size(acc) == 0, r).otherwise(
                F.zip_with(acc, r, lambda x, y: F.greatest(x, y))
            ),
        ).alias(regs_col)
    )


def hll_estimate_col(regs: Column, p: int = DEFAULT_P) -> Column:
    """ORIGINAL estimator + linear-counting small-range correction
    (hll.h:211-238).  Pure JVM expression."""
    m = 1 << p
    alpha = _alpha(m)
    inv_sum = F.aggregate(
        regs,
        F.lit(0.0),
        lambda acc, r: acc + F.pow(F.lit(2.0), -r.cast("double")),
    )
    raw = F.lit(alpha * m * m) / inv_sum
    zeros = F.size(F.filter(regs, lambda r: r == 0))
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0), linear
    ).otherwise(raw)


def hll_compress_col(regs: Column, p: int, p_new: int) -> Column:
    """Fold 2^p registers down to 2^p_new (reference hll_t::compress,
    hll.h:963-985, Ertl arXiv:1702.01284 Algorithm 3).

    New bucket i covers old buckets [i*ratio, (i+1)*ratio); the discarded
    bucket bits become the TOP bits of the new remainder, so with j = first
    non-zero old register in the block (smaller j = more leading zeros =
    larger rho, so the first non-zero dominates):

        new[i] = 0                                  if block all zero
               = min(q'+1, old[i*ratio] + diff)     if j == 0
               = diff - floor(log2(j))              otherwise
                 (= clz of j within the diff-bit window, + 1)

    Register-identical to a natively built p_new sketch over the same
    hashes.
    """
    ratio = 1 << (p - p_new)
    m_new = 1 << p_new
    diff = p - p_new
    cap = 64 - p_new + 1

    def fold(i):
        block = F.slice(regs, i * ratio + 1, ratio)
        jpos = F.array_position(F.transform(block, lambda v: v != 0), F.lit(True))
        j = (jpos - 1).cast("double")
        return (
            F.when(jpos == 0, F.lit(0))
            .when(jpos == 1, F.least(F.lit(cap), F.get(block, 0) + F.lit(diff)))
            .otherwise(F.lit(diff) - F.floor(F.log2(j)).cast("int"))
        ).cast("int")

    return F.transform(F.sequence(F.lit(0), F.lit(m_new - 1)), fold)


def hll_est_error(p: int = DEFAULT_P) -> float:
    """Relative standard error ~1.03896/sqrt(m) (hll.h est_err)."""
    return 1.03896 / math.sqrt(1 << p)


def hll_union_size_col(a: Column, b: Column, p: int = DEFAULT_P) -> Column:
    return hll_estimate_col(F.zip_with(a, b, lambda x, y: F.greatest(x, y)), p)


def hll_intersection_size_col(a: Column, b: Column, p: int = DEFAULT_P) -> Column:
    """Inclusion-exclusion (hll.h:1188-1252): |A| + |B| - |A∪B|, floored."""
    return F.greatest(
        hll_estimate_col(a, p) + hll_estimate_col(b, p) - hll_union_size_col(a, b, p),
        F.lit(0.0),
    )


def hll_jaccard_col(a: Column, b: Column, p: int = DEFAULT_P) -> Column:
    u = hll_union_size_col(a, b, p)
    i = hll_intersection_size_col(a, b, p)
    return F.when(u > 0, i / u).otherwise(F.lit(0.0))
