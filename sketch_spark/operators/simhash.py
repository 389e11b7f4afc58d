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
