"""ntcard streaming coverage-histogram cardinality (Card/VecCard,
reference mult.h:178-337; Mohamadi et al. 2017, PMID 28453674).

The reference keeps `2 << r` saturating counters; `add(v)` (mult.h:246-262)
samples hashes whose top p bits are zero (rate 2^-p), routes the survivor to
bucket = low r bits, doubled into two independent halves by the bit just
below the sampling prefix, and increments with saturation at `maxcnt`.
`report()` (mult.h:278-330) histograms counter values per half, averages the
two halves, and solves a recursive coverage system for F0 (distinct count)
and f_i (number of keys with multiplicity i) — the k-mer coverage histogram.

Spark-first form:

  * the counter table is relational: `groupBy(bucket).count()` with a
    post-clamp (`least(cnt, maxcnt)`) — saturating +1 counters commute with
    clamping the exact count, so partial+final agg IS the reference
    ingest+merge (`operator+=` is element-wise counter add, mult.h:225-244,
    and exact-count-then-clamp equals clamped-add for unit increments up to
    the saturation point);
  * the report() recursion runs over at most maxcnt+1 histogram cells per
    group — a bounded per-group kernel, distributed across groups with
    applyInPandas (never over elements);
  * sampling keeps 2^-p of rows, so the shuffle after the filter carries a
    geometrically small stream at any corpus size — this is exactly why
    ntcard scales to 10^12 elements.

Parity note: mult.h's report() carries a literal x1/2 convention — the
selector bit routes each kept element to ONE of the two 2^r-cell halves
(an extra 1/2 sample per half), but f_i[0] corrects only for the 2^-p
prefix filter (ldexp(-lpmml2r, p+r), mult.h:318), so F0 and every f_i
come back at half the truth.  A second literal quirk: the i>=2 recursion
divides by log(pmeans[0]) (mult.h:325-327) — the UN-normalized cell-count
log — where the ntCard paper (and f_i[1], which uses lpmml2r) calls for
log of the empty-cell FRACTION; multiplicity classes >= 2 are therefore
quantitatively off upstream (mass leaks toward lower classes).  The
reference never validates report() accuracy (its only caller,
testsrc/multtest.cpp:30-31, discards the result).  We reproduce the
formulas literally; the planted-truth test pins what the literal
estimator is actually good for — F0 and the singleton class (both
accurate under the halved-law) — plus bit-exact formula parity.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ntcard_buckets(
    elems: DataFrame,
    group_col: str = "g",
    hash_col: str = "h",
    r: int = 8,
    p: int = 4,
    maxcnt: int = 255,
    hash_bits: int = 64,
) -> DataFrame:
    """(group, h) -> (group, bucket, cnt): the reference's counter table,
    non-empty cells only (empty cells are derivable: each half has 2^r
    cells; report() reconstructs the zero-frequency term).

    h must be a well-mixed non-negative hash of `hash_bits` bits (the
    reference applies WangHash in addh, mult.h:204-207 — callers hash
    first, same convention as hll_registers).  Bucket layout mirrors
    mult.h:246-262: selector bit = bit (hash_bits-p-1); bucket =
    (h & (2^r - 1)) + selector * 2^r.
    """
    assert r + p + 1 <= hash_bits
    pshift = hash_bits - p
    h = F.col(hash_col)
    # p == 0 disables sampling; guard it explicitly (a JVM shift by 64 is
    # a shift by 0 — the filter would silently invert).
    kept = elems if p == 0 else elems.where(F.shiftrightunsigned(h, pshift) == 0)
    lastbit = F.shiftrightunsigned(h, pshift - 1).bitwiseAND(F.lit(1))
    bucket = h.bitwiseAND(F.lit((1 << r) - 1)) + lastbit * F.lit(1 << r)
    return (
        kept.select(F.col(group_col).alias("g"), bucket.alias("bucket"))
        .groupBy("g", "bucket")
        .agg(F.least(F.count(F.lit(1)), F.lit(maxcnt)).cast("long").alias("cnt"))
    )


def ntcard_report_np(counters: np.ndarray, r: int, p: int) -> np.ndarray:
    """The report() recursion (mult.h:278-330) over one group's full
    counter table (len 2*2^r, zeros included).  Returns f where
    f[0] = F0 estimate and f[i] (i>=1) = estimated #keys of multiplicity i.
    """
    counters = np.asarray(counters, dtype=np.int64)
    half = 1 << r
    assert counters.shape[0] == 2 * half
    nvals = int(counters.max()) + 1
    arr = np.zeros((2, nvals), dtype=np.float64)
    for i in range(2):
        vals, freqs = np.unique(counters[i * half:(i + 1) * half], return_counts=True)
        arr[i, vals] = freqs
    pmeans = (arr[0] + arr[1]) * 0.5
    if pmeans[0] <= 0:
        # every cell saturated/occupied: the estimator's log term diverges
        # (the reference would compute log(0)); callers should raise r/p.
        return np.full(nvals, np.nan)
    f = np.zeros(nvals, dtype=np.float64)
    logpm0 = math.log(pmeans[0])
    lpmml2r = logpm0 - r * math.log(2.0)
    f[0] = math.ldexp(-lpmml2r, p + r)
    if nvals > 1:
        f[1] = -pmeans[1] / (pmeans[0] * lpmml2r)
    for i in range(2, nvals):
        s = float(np.dot(np.arange(1, i), pmeans[i - 1:0:-1] * f[1:i]))
        f[i] = -pmeans[i] / (pmeans[0] * logpm0) - s / (i * pmeans[0])
    f[1:] = np.abs(f[1:] * f[0])
    return f


def ntcard_estimate(
    buckets: DataFrame, r: int = 8, p: int = 4, corrected: bool = False
) -> DataFrame:
    """(g, bucket, cnt) -> (g, f0, f_i array<double>): the coverage
    estimate per group.  Per-group work is bounded by the counter-table
    size (2*2^r cells, <= maxcnt+1 histogram values) — applyInPandas runs
    the tiny recursion where the group's cells land, no driver collect.

    `corrected=False` (default) returns the LITERAL reference formula
    values, which carry mult.h's x1/2 convention — f0 is ~half the true
    distinct count (deliberate register-exact parity, see module
    docstring and tests).  Pass corrected=True for consumer-facing
    estimates: f0 and every f_i are scaled by the documented 2x factor
    (round-5 ADVICE: callers using the literal values naively measured
    ~D/2)."""
    half = 1 << r

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        counters = np.zeros(2 * half, dtype=np.int64)
        counters[pdf["bucket"].to_numpy(dtype=np.int64)] = pdf["cnt"].to_numpy(
            dtype=np.int64
        )
        f = ntcard_report_np(counters, r, p)
        if corrected:
            f = f * 2.0
        return pd.DataFrame(
            {"g": [pdf["g"].iloc[0]], "f0": [float(f[0])],
             "f_i": [f[1:].astype(np.float64)]}
        )

    gt = buckets.schema["g"].dataType.simpleString()
    schema = f"g {gt}, f0 double, f_i array<double>"
    return buckets.groupBy("g").applyInPandas(solve, schema=schema)
