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

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def xxhash_family(key: Column, seed: Column) -> Column:
    """Default CM hash family: JVM xxhash64 seeded per row (fast path)."""
    return F.xxhash64(key, seed)


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
    hash_fn: Callable[[Column, Column], Column] = xxhash_family,
) -> DataFrame:
    """Build a Count-Min table: (seed, bucket, cnt) rows; d*w cells max.

    bucket_i(x) = pmod(hash_fn(x, seed_i), w); the default family is JVM
    xxhash64, the oracle tier passes an engine-portable affine mod-prime
    family.  Commutative-monoid counts: partial+final agg, exactly the
    reference's per-cell saturating adds (ccm.h) without the saturation
    (64-bit counts don't overflow here).
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("seed")
    ex = elems.select(F.col(key_col).alias("_k"), seeds)
    cells = ex.select(
        "seed",
        F.pmod(hash_fn(F.col("_k"), F.col("seed")), F.lit(w)).alias("bucket"),
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
    hash_fn: Callable[[Column, Column], Column] = xxhash_family,
) -> DataFrame:
    """Point-frequency estimates for `keys`: est = min over d rows
    (ccm.h est_count).  Broadcast the (small, <= d*w) CM table."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("seed")
    probes = keys.select(F.col(key_col), seeds).select(
        key_col,
        "seed",
        F.pmod(hash_fn(F.col(key_col), F.col("seed")), F.lit(w)).alias("bucket"),
    )
    joined = probes.join(F.broadcast(cm), ["seed", "bucket"], "left").fillna(
        {"cnt": 0}
    )
    return joined.groupBy(key_col).agg(F.min("cnt").cast("long").alias("est_count"))


def cm_sketch_decayed(
    elems: DataFrame,
    key_col: str,
    ts_col: str,
    now,
    half_life_s: float,
    d: int = 4,
    w: int = 1 << 14,
    hash_fn: Callable[[Column, Column], Column] = xxhash_family,
) -> DataFrame:
    """Count-Min with exponential time decay (reference realccm_t,
    mult.h:43-170: counts that fade for concept drift): each occurrence
    contributes 2^(-age / half_life) instead of 1, so the cell sum IS the
    decayed count as of `now` — still a plain commutative sum, so
    partial+final aggregation and mergeability are untouched.  `now` is a
    timestamp Column (cast to double = epoch seconds); cells are
    (seed, bucket, cnt double)."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("seed")
    age_s = now.cast("double") - F.col(ts_col).cast("double")
    weight = F.pow(F.lit(2.0), -age_s / F.lit(half_life_s))
    ex = elems.select(F.col(key_col).alias("_k"), weight.alias("_w"), seeds)
    cells = ex.select(
        "seed",
        F.pmod(hash_fn(F.col("_k"), F.col("seed")), F.lit(w)).alias("bucket"),
        "_w",
    )
    return cells.groupBy("seed", "bucket").agg(F.sum("_w").alias("cnt"))


# ---------------------------------------------------------------------------
# pccm_t — approximate-counting ("probabilistic counter") Count-Min
# (reference ccm.h:876 `pccm_t = ccmbase_t<update::PowerOfTwo>` with the
# Morris power-of-two counter strategy, update.h:35-83).  A BITS-bit cell
# stores a log-domain value c whose decode is est_count(c) = 2^(c-1)
# (update.h:80-82); the reference reaches c by probabilistic increments
# (increment with probability 2^-c, update.h:45-52).  That sequential
# RNG-per-insert path exists to bound per-cell memory on a single node; on
# Spark exact partial counts are FREE (map-side combine already bounds
# state at d*w cells per partition), so the cell value here is the
# deterministic expectation-matched encoding c(n) = floor(log2 n) + 1 —
# the unique c with 2^(c-1) <= n < 2^c, i.e. est_count(c(n)) is the
# largest power of two <= n.  Same storage bound (BITS-bit saturating
# cells), same decode, strictly lower variance than the RNG counter.
# Merging two ALREADY-QUANTIZED sketches (e.g. two persisted checkpoints
# whose exact counts are gone) uses the reference's literal combine rule
# max(i, j) + (i == j) (update.h:73-78).
# ---------------------------------------------------------------------------


def pccm_quantize_col(cnt: Column, bits: int = 8) -> Column:
    """Exact count -> BITS-bit Morris cell: c(n) = floor(log2 n) + 1
    saturated at 2^bits - 1, 0 for empty.  Integer-exact via the binary
    digit count (no float log)."""
    maxc = (1 << bits) - 1
    c = F.length(F.conv(cnt.cast("string"), 10, 2)).cast("long")
    return F.when(cnt <= 0, F.lit(0).cast("long")).otherwise(
        F.least(c, F.lit(maxc).cast("long"))
    )


def pccm_est_col(c: Column) -> Column:
    """Decode: est_count(c) = 2^(c-1), 0 for an empty cell (update.h:80-82).
    pow(2.0, k) is IEEE-exact; valid for c <= 63 (counts < 2^62)."""
    return (
        F.when(c <= 0, F.lit(0.0))
        .otherwise(F.pow(F.lit(2.0), c.cast("double") - 1))
        .cast("long")
    )


def pccm_combine_col(i: Column, j: Column) -> Column:
    """Literal update.h:73-78 Morris-counter merge: max(i, j) + (i == j).
    Equal cells each hold ~2^(c-1); their union ~2^c, which is cell c+1.
    Apply only where both cells exist — our relational sketches keep
    nonzero cells only, so the degenerate combine(0,0)=1 never arises."""
    return F.greatest(i, j) + F.when(i == j, F.lit(1)).otherwise(F.lit(0)).cast(
        "long"
    )


def pccm_sketch(
    elems: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1 << 14,
    bits: int = 8,
    hash_fn: Callable[[Column, Column], Column] = xxhash_family,
) -> DataFrame:
    """Approximate-counting CM table: (seed, bucket, c) rows with BITS-bit
    log-domain cells.  Exact monoid counts through the shuffle (the cheap
    part), quantized at finalize (the space bound the reference's
    probabilistic counters buy)."""
    cm = cm_sketch(elems, key_col, d, w, hash_fn)
    return cm.select(
        "seed", "bucket", pccm_quantize_col(F.col("cnt"), bits).alias("c")
    )


def pccm_merge(a: DataFrame, b: DataFrame, bits: int = 8) -> DataFrame:
    """Merge two quantized sketches cell-wise with the reference combine
    rule (update.h:73-78), saturating at the cell maximum.  Cells present
    on one side only pass through (the other side's cell is empty)."""
    maxc = (1 << bits) - 1
    aa = a.select("seed", "bucket", F.col("c").alias("_ca"))
    bb = b.select("seed", "bucket", F.col("c").alias("_cb"))
    j = aa.join(bb, ["seed", "bucket"], "full_outer")
    both = F.col("_ca").isNotNull() & F.col("_cb").isNotNull()
    merged = F.when(
        both, pccm_combine_col(F.col("_ca"), F.col("_cb"))
    ).otherwise(F.coalesce(F.col("_ca"), F.col("_cb")))
    return j.select(
        "seed",
        "bucket",
        F.least(merged, F.lit(maxc).cast("long")).cast("long").alias("c"),
    )


def pccm_query(
    pccm: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1 << 14,
    hash_fn: Callable[[Column, Column], Column] = xxhash_family,
) -> DataFrame:
    """Point estimates: min over the d cells of est_count(c) (ccm.h
    est_count; min of the decode == decode of the min, est is monotone).
    Broadcast the <= d*w-cell table."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("seed")
    probes = keys.select(F.col(key_col), seeds).select(
        key_col,
        "seed",
        F.pmod(hash_fn(F.col(key_col), F.col("seed")), F.lit(w)).alias("bucket"),
    )
    joined = probes.join(F.broadcast(pccm), ["seed", "bucket"], "left").fillna(
        {"c": 0}
    )
    return joined.groupBy(key_col).agg(
        F.min(pccm_est_col(F.col("c"))).cast("long").alias("est_count")
    )


def default_sign_family(key: Column, seed: Column) -> Column:
    """±1 from an independent xxhash64 bit (seed offset decorrelates it from
    the bucket family)."""
    return F.lit(1) - 2 * F.pmod(F.xxhash64(key, seed + F.lit(1_000_003)), F.lit(2))


def cs_sketch(
    elems: DataFrame,
    key_col: str,
    d: int = 5,
    w: int = 1 << 14,
    hash_fn: Callable[[Column, Column], Column] = xxhash_family,
    sign_fn: Callable[[Column, Column], Column] = default_sign_family,
) -> DataFrame:
    """Count sketch (reference cs_t, ccm.h): cell[j, h_j(x)] += s_j(x) with
    s_j(x) in {-1, +1} — unbiased signed counters, unlike Count-Min's
    one-sided overestimates.  (seed, bucket, val) rows; sum is the
    commutative-monoid merge."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("seed")
    ex = elems.select(F.col(key_col).alias("_k"), seeds)
    cells = ex.select(
        "seed",
        F.pmod(hash_fn(F.col("_k"), F.col("seed")), F.lit(w)).alias("bucket"),
        sign_fn(F.col("_k"), F.col("seed")).alias("_s"),
    )
    return cells.groupBy("seed", "bucket").agg(
        F.sum("_s").cast("long").alias("val")
    )


def cs_query(
    cs: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = 5,
    w: int = 1 << 14,
    hash_fn: Callable[[Column, Column], Column] = xxhash_family,
    sign_fn: Callable[[Column, Column], Column] = default_sign_family,
) -> DataFrame:
    """Point-frequency estimate = median over d of s_j(x) * cell[j, h_j(x)]
    (reference cs_t::est_count, ccm.h).  Odd d keeps the median integral."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("seed")
    probes = keys.select(F.col(key_col), seeds).select(
        key_col,
        "seed",
        F.pmod(hash_fn(F.col(key_col), F.col("seed")), F.lit(w)).alias("bucket"),
        sign_fn(F.col(key_col), F.col("seed")).alias("_s"),
    )
    joined = probes.join(F.broadcast(cs), ["seed", "bucket"], "left").fillna(
        {"val": 0}
    )
    return joined.groupBy(key_col).agg(
        F.expr("median(_s * val)").cast("long").alias("est_count")
    )


def cs_inner_product(csa: DataFrame, csb: DataFrame, d: int) -> DataFrame:
    """Join-size / inner-product estimate between two frequency vectors from
    their count sketches: median over seeds of sum_bucket valA * valB
    (reference join_size_l2est, ccm.h:218-226 — the Spark-native use is
    estimating |A JOIN B| before picking a join strategy, what AQE's runtime
    stats do natively).  Both sketches must share (d, w, hash_fn, sign_fn).
    One row: est_join_size."""
    a = csa.select("seed", "bucket", F.col("val").alias("_va"))
    b = csb.select("seed", "bucket", F.col("val").alias("_vb"))
    per_seed = (
        a.join(b, ["seed", "bucket"])
        .groupBy("seed")
        .agg(F.sum(F.col("_va") * F.col("_vb")).alias("dot"))
    )
    # seeds whose cells never overlap contribute dot = 0; re-materialize all
    # d seeds so the median is over exactly d values.
    spark = csa.sparkSession
    grid = spark.range(d).select(F.col("id").cast("int").alias("seed"))
    full = grid.join(per_seed, "seed", "left").fillna({"dot": 0})
    return full.agg(F.expr("median(dot)").cast("long").alias("est_join_size"))


def cs_l2_moment(cs: DataFrame, d: int) -> DataFrame:
    """Second-moment (F2 = sum f_k^2) estimate: median over seeds of
    sum_bucket val^2 (reference l2est returns its square root)."""
    per_seed = cs.groupBy("seed").agg(F.sum(F.col("val") * F.col("val")).alias("m2"))
    spark = cs.sparkSession
    grid = spark.range(d).select(F.col("id").cast("int").alias("seed"))
    full = grid.join(per_seed, "seed", "left").fillna({"m2": 0})
    return full.agg(F.expr("median(m2)").cast("long").alias("est_f2"))


def quantiles(
    df: DataFrame, value_col: str, probs: list[float], accuracy: int = 10000
) -> DataFrame:
    """percentile_approx wrapper (DDSketch dd.h:146-193 analog)."""
    return df.agg(
        F.percentile_approx(
            F.col(value_col), [F.lit(p) for p in probs], F.lit(accuracy)
        ).alias("quantiles")
    )


# ---------------------------------------------------------------------------
# LPCQF — counting quotient filter (lpcqf.h:129-520).
#
# The reference packs each slot as (signature << countbits) | count and
# resolves bucket collisions by linear/quadratic probing (update_hashed,
# lpcqf.h:385-470).  Its *logical* content — what count_estimate()
# (lpcqf.h:342-370) answers from — is a count per (bucket, signature):
# items sharing both the bucket (hash mod nregs) and the sigbits-bit
# signature share a counter (the structure's false-positive mode); items
# sharing only the bucket get distinct probe slots, i.e. distinct logical
# cells.  Probing and bit-packing are single-node storage layout; the
# relational form keys cells by (bucket, sig) directly, so partial+final
# groupBy aggregation IS the reference's ingest + operator+= merge
# (lpcqf.h:300-324: equal-sig cells add their counts).
#
# The reference's default hasher (lpcqf.h:231-240) is Thomas Wang's
# 64-bit mix — bit-identical to functions.hashing.wanghash_col.
# Count representation: exact 64-bit (the IS_APPROXINC Morris-counter
# mode is covered by pccm_quantize_col/pccm_est_col above — same
# log-domain encoding, composable by callers that want it).
# ---------------------------------------------------------------------------


def _lpcqf_cell(key: Column, nregs: int, sigbits: int,
                hash_fn: Callable[[Column], Column] | None = None):
    # bucket ids are internal — only WHICH KEYS COLLIDE matters, and build
    # and probe use this same mapping.  For non-power-of-2 nregs, signed
    # pmod differs from the reference's uint64 mod on negative hashes
    # (for pow2 nregs, and for the sig bits, the low-bit masks agree
    # exactly); the collision structure is an equally uniform hash
    # partition either way.
    if hash_fn is None:
        from sketch_spark.functions.hashing import wanghash_col

        hash_fn = wanghash_col
    hv = hash_fn(key)
    bucket = F.pmod(hv, F.lit(nregs))
    sig = hv.bitwiseAND(F.lit((1 << sigbits) - 1)) if sigbits else F.lit(0)
    return bucket, sig


def lpcqf_sketch(
    elems: DataFrame,
    key_col: str,
    nregs: int = 1 << 16,
    sigbits: int = 8,
    weight_col: str | None = None,
    hash_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Build the logical LPCQF: (bucket, sig, cnt) cells.

    weight_col: optional per-row count (update(item, count) form,
    lpcqf.h:471-478); default 1 per row."""
    bucket, sig = _lpcqf_cell(F.col(key_col), nregs, sigbits, hash_fn)
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        elems.select(bucket.alias("bucket"), sig.alias("sig"), w.alias("_w"))
        .groupBy("bucket", "sig")
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


def lpcqf_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    nregs: int = 1 << 16,
    sigbits: int = 8,
    hash_fn: Callable[[Column], Column] | None = None,
    broadcast_sketch: bool | None = None,
) -> DataFrame:
    """count_estimate (lpcqf.h:342-370): look up the (bucket, sig) cell;
    absent cell -> 0.

    Join strategy: the reference structure is nregs slots of memory, and
    the relational cell count is bounded by min(distinct keys,
    nregs * 2^sigbits) — the relational form has no slot saturation, so
    sigbits MUST be part of the bound: with sigbits=8 a saturated
    nregs=2^22 sketch can hold 2^30 cells, an executor OOM if force-
    broadcast (round-5 ADVICE).  Auto policy: broadcast iff
    nregs * 2^sigbits <= 2^22 (~copyable per executor); otherwise the
    probe-side semi-filter below bounds the broadcast by #probes instead,
    and AQE still picks a broadcast on its own when runtime stats allow.
    Override with broadcast_sketch."""
    bucket, sig = _lpcqf_cell(F.col(key_col), nregs, sigbits, hash_fn)
    probes = keys.select(
        F.col(key_col), bucket.alias("bucket"), sig.alias("sig")
    )
    if broadcast_sketch is None:
        broadcast_sketch = nregs * (1 << sigbits) <= (1 << 22)
    if broadcast_sketch:
        rhs = F.broadcast(sketch)
    else:
        # big sketch, point-probe set: never sort/shuffle the cell table
        # against a small probe side — semi-filter the cells with a
        # broadcast of the probe keys (one map-side pass over the cells),
        # then the surviving cells (<= #probes rows) broadcast back for
        # the outer join.  Probe sets too large to broadcast should join
        # the sketch DataFrame directly instead of using this helper.
        pk = probes.select("bucket", "sig").distinct()
        rhs = F.broadcast(
            sketch.join(F.broadcast(pk), on=["bucket", "sig"], how="left_semi")
        )
    return probes.join(rhs, on=["bucket", "sig"], how="left").select(
        key_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("est_count")
    )


def lpcqf_inner_product(a: DataFrame, b: DataFrame) -> DataFrame:
    """inner_product (lpcqf.h:243-298): sum of count products over cells
    whose bucket AND signature match — the sketch's join-size estimate.
    Disjoint sketches (empty join) yield 0, not null (sum over an empty
    aggregate is null, which would silently drop the row from any
    threshold comparison — same guard cs_inner_product applies)."""
    return (
        a.alias("a")
        .join(b.alias("b"), on=["bucket", "sig"])
        .agg(
            F.coalesce(
                F.sum(F.col("a.cnt") * F.col("b.cnt")), F.lit(0)
            ).cast("long").alias("inner_product")
        )
    )
