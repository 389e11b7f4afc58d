"""Frequency / heavy-hitter / quantile operators (SURVEY.md §2.5).

  * top-k heavy hitters (HeavyKeeper/ObjHeap analog, hk.h:284-470,
    heap.h:29-200): exact groupBy-count + deterministic top-k — at any scale
    this is one partial-agg shuffle, which Spark does better than a
    per-node decay sketch unless the key space explodes;
  * Count-Min sketch (ccm.h): the *relational* CM — d hash rows per element
    into w buckets; point estimate = min over d bucket counts.  One
    groupBy((seed, bucket)) of d*N rows; useful when the key space is too
    large to count exactly (hot-shingle census at 10^12 turns);
  * quantiles: Spark builtin percentile_approx (DDSketch dd.h analog).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_k(
    df: DataFrame, key_cols: list[str], k: int, count_col: str = "cnt"
) -> DataFrame:
    """Deterministic exact top-k: count desc, then keys asc as tie-break."""
    agg = df.groupBy(*key_cols).agg(F.count(F.lit(1)).cast("long").alias(count_col))
    return agg.orderBy(F.desc(count_col), *[F.asc(c) for c in key_cols]).limit(k)


def cm_sketch(
    elems: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1 << 14,
) -> DataFrame:
    """Build a Count-Min table: (seed, bucket, cnt) rows; d*w cells max.

    bucket_i(x) = pmod(xxhash64(x, seed_i), w).  Commutative-monoid counts:
    partial+final agg, exactly the reference's per-cell saturating adds
    (ccm.h) without the saturation (64-bit counts don't overflow here).
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("seed")
    ex = elems.select(F.col(key_col).alias("_k"), seeds)
    cells = ex.select(
        "seed",
        F.pmod(F.xxhash64(F.col("_k"), F.col("seed")), F.lit(w)).alias("bucket"),
    )
    return cells.groupBy("seed", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cm_query(
    cm: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1 << 14,
) -> DataFrame:
    """Point-frequency estimates for `keys`: est = min over d rows
    (ccm.h est_count).  Broadcast the (small, <= d*w) CM table."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("seed")
    probes = keys.select(F.col(key_col), seeds).select(
        key_col,
        "seed",
        F.pmod(F.xxhash64(F.col(key_col), F.col("seed")), F.lit(w)).alias("bucket"),
    )
    joined = probes.join(F.broadcast(cm), ["seed", "bucket"], "left").fillna(
        {"cnt": 0}
    )
    return joined.groupBy(key_col).agg(F.min("cnt").cast("long").alias("est_count"))


def quantiles(
    df: DataFrame, value_col: str, probs: list[float], accuracy: int = 10000
) -> DataFrame:
    """percentile_approx wrapper (DDSketch dd.h:146-193 analog)."""
    return df.agg(
        F.percentile_approx(
            F.col(value_col), [F.lit(p) for p in probs], F.lit(accuracy)
        ).alias("quantiles")
    )
