"""Approximate nearest-neighbor search over embedding columns.

Two tiers:
  * brute-force cosine top-k — the exact baseline: broadcast the query set,
    JVM-side zip_with dot products, window top-k.  Linear scan; correct at
    any scale where queries are few.
  * LSH-bucketed (random hyperplane / SRP): sign-bit signatures via a
    vectorized pandas UDF (one matmul per Arrow batch), candidate
    generation by signature-band equi-join (same bucket shuffle pattern as
    the MinHash LSH), exact re-rank inside candidates.  The scale path:
    shuffle is per-bucket, never all-pairs.

The random hyperplanes are seeded deterministically (numpy PCG64), so the
index is reproducible — the engine's determinism contract extends here.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sketch_spark.functions.arrays import cosine_col


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query (query table broadcast)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", cosine_col(F.col("qv"), F.col("nv")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cos")
    )


def srp_signatures(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 64,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Signed-random-projection signature: bit j = sign(<v, r_j>).
    One numpy matmul per Arrow batch (mapInPandas)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits)).astype(np.float64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            bits = (mat @ planes) > 0
            sig = np.zeros(len(pdf), dtype=np.uint64)
            for j in range(n_bits):
                sig |= bits[:, j].astype(np.uint64) << np.uint64(j)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "srp_sig": sig.astype(np.int64)}
            )

    return vecs.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} long, srp_sig long"
    )


def srp_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_bits: int = 64,
    dim: int = 64,
    band_bits: int = 8,
    seed: int = 42,
    bucket_cap: int = 1024,
    max_cand_per_query: int | None = None,
) -> DataFrame:
    """LSH-bucketed ANN: band the SRP signature into n_bits/band_bits bands,
    equi-join query and corpus bands, exact cosine re-rank of candidates.
    Recall grows with #bands; cost stays per-bucket.

    Hot-bucket bound (same pattern as lsh.candidate_pairs): corpus members
    of one (band, bkey) bucket are capped at `bucket_cap`, ranked by a
    band-diversified deterministic hash — a bucket holding near-duplicate
    embedding mass (|q∩bucket| x |corpus∩bucket| candidate rows) cannot
    explode the join, and each corpus vector still gets n_bands independent
    draws to survive a cap.  `max_cand_per_query` adds the reference's
    maxcand early stop (ssi.h:387-444): per query keep the top candidates
    by #matching bands (specificity) before the exact re-rank."""
    from pyspark.sql import Window

    n_bands = n_bits // band_bits
    mask = (1 << band_bits) - 1

    def bands(df: DataFrame, prefix: str) -> DataFrame:
        sig = srp_signatures(df, id_col, vec_col, n_bits, dim, seed)
        # static band list (shift amounts must be Python ints)
        band_exprs = F.array(
            *[
                F.shiftrightunsigned(F.col("srp_sig"), i * band_bits).bitwiseAND(
                    F.lit(mask)
                )
                for i in range(n_bands)
            ]
        )
        return sig.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.posexplode(band_exprs).alias("band", "bkey"),
        )

    qb = bands(queries, "q")
    cb = bands(corpus, "n")
    wcap = Window.partitionBy("band", "bkey").orderBy(
        F.xxhash64(F.col("n_id"), F.col("band")), F.col("n_id")
    )
    cb = (
        cb.withColumn("_rn", F.row_number().over(wcap))
        .where(F.col("_rn") <= bucket_cap)
        .drop("_rn")
    )
    cands = (
        qb.join(cb, ["band", "bkey"])
        .where(F.col("q_id") != F.col("n_id"))
        .groupBy("q_id", "n_id")
        .agg(F.count(F.lit(1)).alias("_nb"))
    )
    if max_cand_per_query is not None:
        wq = Window.partitionBy("q_id").orderBy(F.desc("_nb"), F.asc("n_id"))
        cands = (
            cands.withColumn("_rq", F.row_number().over(wq))
            .where(F.col("_rq") <= max_cand_per_query)
            .drop("_rq")
        )
    cands = cands.drop("_nb")
    qv = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    nv = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
    scored = (
        cands.join(F.broadcast(qv), "q_id")
        .join(nv, "n_id")
        .select("q_id", "n_id", cosine_col(F.col("qv"), F.col("nv")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cos")
    )
