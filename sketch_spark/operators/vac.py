"""VACSketch / PowerVACSketch — sampled multi-level sketch cascades
(reference vac.h:16-125).

The reference keeps n base sketches; each `addh(x)` call draws a
thread-local random word and inserts x into levels 0..end-1 where
end = min(ctz(draw)+1, n) (vac.h:37-42) — level i therefore sees a
2^-i sample OF OCCURRENCES, so level-i distinct counts respond to key
multiplicity (a key seen c times reaches level i with prob 1-(1-2^-i)^c):
the cascade is a multiplicity/coverage profiler, not just a cardinality
sketch.  PowerVACSketch generalizes the level law to base^-i via a
precomputed threshold table (construct_power_table, vac.h:60-72:
lut[i] = 2^64 / base^i; the draw must stay below lut[i] to continue).

Deviation, by design: the reference samples with a thread-local RNG per
insert, so two runs over the same data build different sketches.  A
distributed, checkpoint-resumable pipeline cannot accept that — we derive
the draw from a hash of a per-OCCURRENCE identity (e.g. xxhash64 of the
row's unique id), which has the same uniform law, preserves the
per-occurrence (not per-key) sampling semantics, and makes the build
deterministic, mergeable, and resume-stable.

Level membership is pure arithmetic: for base 2, a draw u reaches level i
iff its low i bits are zero (ctz(u) >= i  <=>  u mod 2^i == 0); for general
base, iff u < floor(2^hash_bits / base^i).  Merge (operator+=, vac.h:44-51)
is element-wise base-sketch merge per level — in relational form the level
column is just part of the group key, so partial+final aggregation of the
base sketch (HLL register max, exact distinct, ...) is the merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def vac_level_thresholds(base: float, n: int, hash_bits: int = 64) -> list[int]:
    """construct_power_table (vac.h:60-72) in draw-value space: element
    with draw u < thresholds[i] belongs to level i.  thresholds[0] covers
    everything (level 0 always receives the element)."""
    if base <= 1.0:
        raise ValueError(f"base {base} is forbidden. Must be > 1.")
    full = 1 << hash_bits
    return [min(full, int(full / (base ** i))) for i in range(n)]


def vac_levels(
    elems: DataFrame,
    draw_col: str,
    n: int,
    base: float = 2.0,
    hash_bits: int = 64,
) -> DataFrame:
    """Explode each row to one row per cascade level it belongs to
    (column `level`, 0-indexed).  draw_col must be a uniform non-negative
    hash of `hash_bits` bits, unique-ish per OCCURRENCE (see module doc).

    base=2.0 reproduces VACSketch's ctz law exactly (u mod 2^i == 0);
    other bases use the PowerVACSketch threshold table.  The exploded
    stream is sum_i base^-i * N ~ N*base/(base-1) rows — a constant-factor
    expansion, shuffled only by the downstream base-sketch aggregation.
    """
    u = F.col(draw_col)
    # Level membership is a contiguous prefix 0..end-1 (both laws are
    # monotone in i), so compute `end` per row as a statically-unrolled
    # codegen sum of n-1 booleans and explode EXACTLY the kept rows —
    # the generated stream is sum_i base^-i * N ~ N*base/(base-1) rows
    # (2N for base 2), NOT the n*N explode-then-filter a naive cascade
    # pays (at 10^12 elements and n=16 that is an 8x generated-row cut
    # in this stage; everything stays whole-stage codegen, no Python).
    if base == 2.0:
        # level i reached  <=>  u mod 2^i == 0  <=>  (u & (2^i-1)) == 0.
        # bitwiseAND (not pmod) so negative longs reinterpret as the same
        # uint64 bit pattern (the reference draw is a full uint64).
        terms = [
            (u.bitwiseAND(F.lit((1 << i) - 1)) == 0).cast("int")
            for i in range(1, n)
        ]
    else:
        # power path: compare a 62-bit slice of the draw against the
        # reference lut (construct_power_table, vac.h:60-72) scaled to
        # 2^62 — signed LongType cannot order full 64-bit draws, and any
        # fixed bit-field of a uniform hash is an equally uniform draw.
        bits = min(hash_bits, 62)
        thr = vac_level_thresholds(base, n, hash_bits=bits)
        u62 = u.bitwiseAND(F.lit((1 << bits) - 1))
        terms = [(u62 < F.lit(thr[i])).cast("int") for i in range(1, n)]
    end = F.lit(1)
    for t in terms:
        end = end + t
    return elems.select(
        "*", F.explode(F.sequence(F.lit(0), end - 1)).alias("level")
    )


def vac_hll(
    elems: DataFrame,
    group_col: str,
    key_hash_col: str,
    draw_col: str,
    n: int,
    p: int = 10,
    base: float = 2.0,
    hash_bits: int = 64,
) -> DataFrame:
    """The HVAC instantiation (vac.h:118: VACSketch<hll_t>): per
    (group, level) HLL register arrays over the key hash.  Returns
    (g, level, regs) with g keeping the caller's type — merge across
    partitions/datasets is the standard register max, per level.  The
    composite (group, level) key rides through the register agg as a
    STRUCT, which is exact for every group type (an earlier string
    concat_ws encoding silently reassigned NULL groups and mangled
    groups containing the separator byte)."""
    from sketch_spark.operators.hll import hll_registers

    lv = vac_levels(elems, draw_col, n, base=base, hash_bits=hash_bits)
    tagged = lv.select(
        F.struct(
            F.col(group_col).alias("g"), F.col("level").alias("level")
        ).alias("_gl"),
        F.col(key_hash_col).alias("_h"),
    )
    regs = hll_registers(tagged, "_gl", "_h", p=p, hash_bits=hash_bits)
    return regs.select(
        F.col("_gl.g").alias("g"),
        F.col("_gl.level").alias("level"),
        F.col("regs"),
    )


def vac_distinct(
    elems: DataFrame,
    group_col: str,
    key_col: str,
    draw_col: str,
    n: int,
    base: float = 2.0,
    hash_bits: int = 64,
) -> DataFrame:
    """Exact-count cascade profile: (g, level, n_occurrences, n_distinct).
    The small-group / oracle-checkable tier (base sketch = exact distinct;
    swap in vac_hll when the per-level key space is too large to count)."""
    lv = vac_levels(elems, draw_col, n, base=base, hash_bits=hash_bits)
    return lv.groupBy(F.col(group_col).alias("g"), "level").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.count_distinct(F.col(key_col)).cast("long").alias("n_distinct"),
    )
