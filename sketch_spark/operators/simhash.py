"""SimHash over shingle-hash arrays + Hamming verification.

The reference has no SimHash by that name; its analog is the b-bit
register-equality machinery (bbmh.h + count_eq.h — SURVEY.md §2.6).  The
north rule asks for SimHash Hamming verification as a secondary dedup
filter, so this is a first-class operator here:

  sim bit i = 1  iff  #(shingles with hash bit i set) >= #(unset)

Computed as one nested higher-order SQL aggregate over the per-conversation
shingle array — zero shuffle, zero Python, O(64 * |shingles|) JVM work per
conversation.  Verification = bit_count(a XOR b) (arrays.hamming_col).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sketch_spark.functions.arrays import hamming_col  # re-export  # noqa: F401


def simhash_expr(arr_col: str, n_bits: int = 64, strict: bool = False) -> Column:
    """n_bits-wide SimHash of an array<long> column as ONE per-row aggregate
    expression — zero shuffle, zero Python (by name — the bit index is a
    lambda variable, which the Python DSL's shiftleft can't take, so this is
    a SQL-text expression).

    strict=False: bit set when votes >= 0 (the engine's default tie rule);
    strict=True:  bit set when votes > 0 (the oracle-portable rule — ties
    fall to 0 identically in Spark and DuckDB integer arithmetic).
    """
    cmp = ">" if strict else ">="
    votes = (
        f"aggregate({arr_col}, 0L, "
        f"(acc, h) -> acc + IF((shiftright(h, i) & 1) = 1, 1, -1))"
    )
    return F.expr(
        f"CASE WHEN size({arr_col}) = 0 THEN 0L ELSE "
        f"aggregate(sequence(0, {n_bits - 1}), 0L, "
        f"(sh, i) -> sh + IF(({votes}) {cmp} 0, shiftleft(1L, i), 0L)) END"
    )


def simhash64_expr(arr_col: str) -> Column:
    """64-bit SimHash (votes >= 0 tie rule) — see simhash_expr."""
    return simhash_expr(arr_col, 64, strict=False)


def simhash_signatures(
    df: DataFrame, arr_col: str = "shingles", out_col: str = "simhash"
) -> DataFrame:
    return df.withColumn(out_col, simhash64_expr(arr_col))


def simhash_signatures_np(
    df: DataFrame, arr_col: str = "shingles", id_col: str = "conv_id",
    out_col: str = "simhash", n_bits: int = 64, strict: bool = False,
) -> DataFrame:
    """Vectorized mapInPandas variant for the hot path: the SQL nested
    aggregate is interpreted per (bit, element); numpy does the whole Arrow
    batch with two matrix ops.  Tie rule matches simhash_expr (strict).
    The id column keeps its input type."""
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches):
        shifts = np.arange(n_bits, dtype=np.uint64)
        for pdf in batches:
            # NULL and empty arrays both map to 0, exactly like
            # simhash_expr (its IF(null-votes >= 0, ...) takes the else
            # branch for null arrays and the CASE guard handles empty) —
            # the two paths are interchangeable, pinned by
            # test_simhash_np_null_array_matches_expr_path.  Callers
            # treating hamming-0 as duplicate evidence must filter
            # null/empty shingle docs upstream (the pipeline's conv table
            # does).
            out = np.zeros(len(pdf), dtype=np.int64)
            for i, arr in enumerate(pdf[arr_col]):
                if arr is None or len(arr) == 0:
                    continue
                h = np.asarray(arr, dtype=np.int64).astype(np.uint64)
                bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
                votes = (2 * bits - 1).sum(axis=0)
                keep = (votes > 0) if strict else (votes >= 0)
                sim = int(np.bitwise_or.reduce(keep.astype(np.uint64) << shifts))
                out[i] = sim - (1 << 64) if sim >= (1 << 63) else sim
            yield pd.DataFrame({id_col: pdf[id_col], out_col: out})

    return df.select(id_col, arr_col).mapInPandas(
        gen, schema=f"{id_col} {id_type}, {out_col} long"
    )


def simhash_py(hashes: list[int]) -> int:
    """Python oracle for tests (same >=0 tie rule)."""
    if not hashes:
        return 0
    out = 0
    for i in range(64):
        votes = sum(1 if (h >> i) & 1 else -1 for h in hashes)
        if votes >= 0:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out


def _xor_masks(width: int, radius: int) -> list[int]:
    """All non-zero XOR masks of `width` bits with popcount <= radius."""
    from itertools import combinations

    out = []
    for k in range(1, radius + 1):
        for pos in combinations(range(width), k):
            m = 0
            for p in pos:
                m |= 1 << p
            out.append(m)
    return out


def hamming_pairs_exact(
    df: DataFrame,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
    bits: int = 64,
    max_hamming: int = 8,
    n_chunks: int | None = None,
    block_cols: tuple[str, ...] = (),
) -> DataFrame:
    """EXACT all-pairs Hamming-radius self-join: every pair (a < b, same
    block) with bit_count(sim_a XOR sim_b) <= max_hamming — multi-index
    hashing with split enumeration (Norouzi/Punjani/Fleet, "Fast Search in
    Hamming Space with Multi-Index Hashing", CVPR'12; Manku et al.'s
    simhash tables are the e=0 special case).

    Why not plain pigeonhole chunks: covering radius r with zero-error
    chunk matches forces r+1 chunks of bits/(r+1) bits each — at r=12 over
    60 bits that is 13 keys of ~4.6 bits, so every bucket holds ~n/24 of
    the corpus and the equi-join tends to n²/24 pairs per chunk (VERDICT
    r3 #3: an all-pairs join wearing a thin filter).  Here the hash is cut
    into q chunks and each side ALSO emits every chunk value XOR-flipped by
    up to e = floor(r/q) bits: a pair within radius r has some chunk with
    d_c <= e (q*(e+1) > r), and any <= e-bit chunk difference M factors
    through the stored value (probe v_y ^ M == stored v_x), so the
    (chunk, value) equi-join is still an exact candidate superset — but on
    keys of bits/q bits instead of bits/(r+1).  At r=12, q=5: 12-bit keys,
    79 emitted rows per chunk per hash, expected join output ~q*C(w,<=e)*
    n²/2^w = 0.10*n² on uniform hashes vs 0.54*n² for the 13-chunk form —
    5.6x fewer candidate rows and 2^7.4 ~ 170x smaller max buckets (the
    skew term).  q trades emission volume against candidate volume;
    exactness holds for every q >= 1.

    Honesty note for the 100-TB reader: exact radius-r search on UNIFORM
    b-bit codes with r/b ~ 0.2 is Theta(n²) with a small constant for any
    enumeration-free filter — the knobs move the constant (and real simhash
    corpora are far from uniform).  For true sublinearity lower the radius
    or widen the simhash (256-bit Manku-style), both exposed here via
    (bits, max_hamming, n_chunks).

    Scale shape: work is done per DISTINCT hash value (near-dup corpora
    collapse heavily), doc pairs are expanded only for verified hash pairs
    (output-bound joins), and same-hash groups pair directly (they are true
    output).  Returns (a, b, hamming) with a < b by id ordering.
    """
    assert 0 < bits <= 64
    bc = list(block_cols)
    d = df.where(F.col(sim_col).isNotNull()).select(
        *bc, F.col(sim_col).alias("_h"), F.col(id_col).alias("_id")
    )
    dh = d.select(*bc, "_h").distinct()
    hpairs = mih_candidate_hash_pairs(
        dh, bits, max_hamming, n_chunks, bc
    ).withColumn(
        "_d", F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    ).where(F.col("_d") <= max_hamming)
    # expand verified hash pairs to doc pairs (output-bound joins)
    da = d.select(*bc, F.col("_h").alias("_ha"), F.col("_id").alias("_ida"))
    db = d.select(*bc, F.col("_h").alias("_hb"), F.col("_id").alias("_idb"))
    cross = (
        hpairs.join(da, bc + ["_ha"])
        .join(db, bc + ["_hb"])
        .select(
            F.least("_ida", "_idb").alias("a"),
            F.greatest("_ida", "_idb").alias("b"),
            F.col("_d").alias("hamming"),
        )
    )
    # same-hash groups: distance 0, every within-group pair is true output
    g1, g2 = d.alias("g1"), d.alias("g2")
    scond = (F.col("g1._h") == F.col("g2._h")) & (
        F.col("g1._id") < F.col("g2._id")
    )
    for c in bc:
        scond = scond & (F.col(f"g1.{c}") == F.col(f"g2.{c}"))
    same = g1.join(g2, scond).select(
        F.col("g1._id").alias("a"),
        F.col("g2._id").alias("b"),
        F.lit(0).alias("hamming"),
    )
    return cross.unionByName(same)


def mih_candidate_hash_pairs(
    dh: DataFrame,
    bits: int,
    max_hamming: int,
    n_chunks: int | None = None,
    block_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Candidate DISTINCT-hash pairs of the multi-index join, BEFORE the
    XOR distance verify — an exact superset of all pairs within
    max_hamming.  Input dh: (block_cols..., _h) distinct hash rows.
    Exposed separately so plan tests can measure candidate volume
    (tests/test_simhash.py asserts it stays far under the all-pairs count
    and under the 13-chunk form on a uniform synthetic corpus)."""
    if n_chunks is None:
        n_chunks = max(1, -(-(max_hamming + 1) // 3))
    e = max_hamming // n_chunks
    bc = list(block_cols)
    bounds = [round(bits * c / n_chunks) for c in range(n_chunks + 1)]
    # q*(floor(r/q)+1) > r always (r = a*q + s => q*(a+1) > r), so any
    # n_chunks is exact; but small n_chunks explodes the probe enumeration
    # C(bits/q, <=e) — refuse combinatorial plans instead of hanging.
    from math import comb

    n_entries = sum(
        sum(comb(bounds[c + 1] - bounds[c], k) for k in range(e + 1))
        for c in range(n_chunks)
    )
    if n_entries > 50_000:
        raise ValueError(
            f"multi-index enumeration too large ({n_entries} probe keys "
            f"per hash at n_chunks={n_chunks}, e={e}); raise n_chunks"
        )

    chunk_arr = F.array(
        *[
            F.shiftrightunsigned(F.col("_h"), bounds[c])
            .bitwiseAND(F.lit((1 << (bounds[c + 1] - bounds[c])) - 1))
            for c in range(n_chunks)
        ]
    )
    entries = F.array(
        *[
            F.struct(F.lit(c).alias("c"), F.lit(m).alias("m"))
            for c in range(n_chunks)
            for m in [0] + _xor_masks(bounds[c + 1] - bounds[c], e)
        ]
    )
    ex = (
        dh.select(*bc, "_h", chunk_arr.alias("_ca"), F.explode(entries).alias("_cm"))
        .select(
            *bc,
            "_h",
            F.col("_cm.c").alias("_c"),
            F.element_at("_ca", F.col("_cm.c") + 1)
            .bitwiseXOR(F.col("_cm.m"))
            .alias("_v"),
            (F.col("_cm.m") == 0).alias("_stored"),
        )
    )
    stored = ex.where("_stored").alias("x")
    cond = (
        (F.col("x._c") == F.col("y._c"))
        & (F.col("x._v") == F.col("y._v"))
        & (F.col("x._h") < F.col("y._h"))
    )
    for c in bc:
        cond = cond & (F.col(f"x.{c}") == F.col(f"y.{c}"))
    return (
        stored.join(ex.alias("y"), cond)
        .select(
            *[F.col(f"x.{c}") for c in bc],
            F.col("x._h").alias("_ha"),
            F.col("y._h").alias("_hb"),
        )
        .distinct()
    )


def hamming_filter(
    pairs: DataFrame,
    sims: DataFrame,
    id_col: str = "conv_id",
    sim_col: str = "simhash",
    max_hamming: int = 8,
) -> DataFrame:
    """Secondary verification: keep candidate pairs whose SimHashes are
    within max_hamming bits (count_eq.h-style register check, here on the
    64-bit signature)."""
    sa = sims.select(F.col(id_col).alias("a"), F.col(sim_col).alias("_sa"))
    sb = sims.select(F.col(id_col).alias("b"), F.col(sim_col).alias("_sb"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .withColumn("hamming", hamming_col(F.col("_sa"), F.col("_sb")))
        .where(F.col("hamming") <= max_hamming)
        .drop("_sa", "_sb")
    )
