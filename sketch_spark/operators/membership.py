"""Membership operators — the Bloom-filter surface (reference bf.h).

At the DataFrame level, membership IS a join: `may_contain` (bf.h:623-676)
maps to left_semi, negative membership to left_anti — exact, shuffle-
partitioned, and Catalyst already builds runtime Bloom filters for join
pruning (spark.sql.optimizer.runtime.bloomFilter.enabled).

A materialized Bloom bitset is still useful as a *compact broadcastable
prefilter* when the probe side is huge and the build side must ship to
every executor; `bloom_build`/`bloom_may_contain_col` provide that in pure
relational form: the "bitset" is an array<long> built by one aggregation
(bitwise-OR monoid = bf.cpp:25-35 merge semantics), probed by a JVM
expression.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def semi_join(probe: DataFrame, build: DataFrame, on: list[str]) -> DataFrame:
    """rows of probe whose key appears in build — bf.may_contain == true."""
    return probe.join(build.select(*on).distinct(), on, "left_semi")


def anti_join(probe: DataFrame, build: DataFrame, on: list[str]) -> DataFrame:
    """rows of probe whose key does NOT appear in build."""
    return probe.join(build.select(*on).distinct(), on, "left_anti")


def bloom_params(n: int, fpr: float = 0.01) -> tuple[int, int]:
    """(#bits rounded to a multiple of 64, #hash functions) for n elems."""
    m = max(64, int(-n * math.log(fpr) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2))) if n else 1
    return m, k


def default_bloom_pos(key: Column, seed: Column, n_bits: int) -> Column:
    """Default bit-position family: pmod(xxhash64(key, seed), n_bits)."""
    return F.pmod(F.xxhash64(key, seed), F.lit(n_bits))


def bloom_build(
    elems: DataFrame,
    key_col: str,
    n_bits: int,
    n_hashes: int,
    pos_fn=default_bloom_pos,
) -> DataFrame:
    """One-row DataFrame with `bits array<long>` (ceil(n_bits/64) words).

    Word/bit positions from pos_fn(key, seed, n_bits) (default xxhash64; the
    oracle tier passes an engine-portable affine mod-prime family);
    aggregation is bit_or per word — the commutative monoid union of
    bf.cpp:25-35.

    n_words rounds UP: a floor silently dropped the last partial word for
    n_bits not divisible by 64, so positions in the tail never
    materialized and bloom_probe returned null (a FALSE NEGATIVE) for
    genuinely inserted keys.  The pad bits beyond n_bits are never set
    (positions are mod n_bits) and never counted (bit_count sees zeros),
    so density-based estimators still use m = n_bits correctly.
    """
    n_words = (n_bits + 63) // 64
    seeds = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    pos = elems.select(F.col(key_col).alias("_k"), seeds).select(
        pos_fn(F.col("_k"), F.col("seed"), n_bits).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / 64).cast("int").alias("w"),
            # dynamic shift amount needs the SQL form
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("word"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("mm")
    ).select(
        F.array(
            *[
                F.coalesce(F.element_at(F.col("mm"), F.lit(i)), F.lit(0).cast("long"))
                for i in range(n_words)
            ]
        ).alias("bits")
    )


def bloom_cardinality_col(bits: Column, n_bits: int, n_hashes: int) -> Column:
    """Cardinality from bit density (reference bf.h:83-90):
    n ≈ -(m/k) * ln(1 - X/m), X = #set bits.  Saturated filters (X == m)
    return null."""
    x = F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, w: acc + F.bit_count(w)
    ).cast("double")
    frac = x / F.lit(float(n_bits))
    return F.when(
        frac < 1.0, -F.lit(n_bits / n_hashes) * F.log(F.lit(1.0) - frac)
    )


def bloom_union_col(a: Column, b: Column) -> Column:
    """Union of filters = bitwise OR (bf.cpp:25-35 merge monoid)."""
    return F.zip_with(a, b, lambda x, y: x.bitwiseOR(y))


def bloom_jaccard_col(a: Column, b: Column, n_bits: int, n_hashes: int) -> Column:
    """Set Jaccard from two (same-shape) Bloom bitsets via cardinality
    inversion of A, B and A∪B (reference bf_t::jaccard_index,
    bf.h:385-440): J = (|A| + |B| - |A∪B|) / |A∪B|."""
    ca = bloom_cardinality_col(a, n_bits, n_hashes)
    cb = bloom_cardinality_col(b, n_bits, n_hashes)
    cu = bloom_cardinality_col(bloom_union_col(a, b), n_bits, n_hashes)
    return F.greatest((ca + cb - cu) / cu, F.lit(0.0))


def bloom_probe(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    n_bits: int,
    n_hashes: int,
    out_col: str = "may_contain",
    pos_fn=default_bloom_pos,
) -> DataFrame:
    """Probe rows against the (broadcast) one-row bloom table.

    maybe-present <=> every one of the k probed bits is set.  No false
    negatives (bf.h:623-676 contract).  Column-valued shift amounts aren't
    supported by the Python DSL, so the bit test indexes a static array of
    the 64 single-bit masks instead of shifting.
    """
    masks = F.array(
        *[F.lit(1 << i if i < 63 else -(1 << 63)).cast("long") for i in range(64)]
    )
    joined = probe.crossJoin(F.broadcast(bloom))
    cond = None
    for s in range(n_hashes):
        p = pos_fn(F.col(key_col), F.lit(s), n_bits)
        word = F.get(F.col("bits"), (p / 64).cast("int"))
        mask = F.element_at(masks, F.pmod(p, F.lit(64)).cast("int") + 1)
        c = word.bitwiseAND(mask) != 0
        cond = c if cond is None else (cond & c)
    return joined.withColumn(out_col, cond).drop("bits")
