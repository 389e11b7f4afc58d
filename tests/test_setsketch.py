"""SetSketch family (setsketch.h:274-976): continuous CSetSketch build,
merge-as-union, cardinality / Jaccard / alpha-beta-mu estimators, the
quantized variant, and the ML Jaccard solver."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketch_spark.functions.hashing import wanghash_np
from sketch_spark.operators import setsketch as SS


def _distinct(n, off=0):
    return wanghash_np(np.arange(off, off + n, dtype=np.uint64)).astype(np.int64)


def test_cset_spark_matches_numpy_oracle(spark):
    hs = [int(v) for v in _distinct(200)]
    df = spark.createDataFrame([("x", hs)], "conv_id string, shingles array<long>")
    got = SS.cset_sketch_np(df, m=64).collect()[0].cset
    expect = SS.cset_registers_py(hs, m=64)
    assert np.allclose(got, expect, rtol=0, atol=0)


def test_cset_cardinality(spark):
    m = 256
    rows = [("a", [int(v) for v in _distinct(5000)]),
            ("b", [int(v) for v in _distinct(300, off=9000)])]
    df = spark.createDataFrame(rows, "conv_id string, shingles array<long>")
    sk = SS.cset_sketch_np(df, m=m)
    got = {r.conv_id: r.est for r in sk.select(
        "conv_id", SS.cset_cardinality_col(F.col("cset"), m).alias("est")
    ).collect()}
    for cid, truth in (("a", 5000), ("b", 300)):
        assert abs(got[cid] - truth) / truth < 4 / m ** 0.5, (cid, got[cid])


def test_cset_merge_is_union_sketch(spark):
    """finalize(A) min-merge finalize(B) == finalize(A ∪ B), bit-exact —
    the commutative-monoid property every sketch here shares."""
    m = 64
    a = _distinct(400)
    b = _distinct(400, off=300)  # overlap 100
    union = np.unique(np.concatenate([a, b]))
    df = spark.createDataFrame(
        [("a", [int(v) for v in a]), ("b", [int(v) for v in b]),
         ("u", [int(v) for v in union])],
        "conv_id string, shingles array<long>",
    )
    sk = {r.conv_id: r.cset for r in SS.cset_sketch_np(df, m=m).collect()}
    merged = np.minimum(np.array(sk["a"]), np.array(sk["b"]))
    assert np.array_equal(merged, np.array(sk["u"]))


def test_cset_jaccard_and_triple(spark):
    m = 512
    n, overlap = 2000, 800
    a = _distinct(n)
    b = _distinct(n, off=n - overlap)
    true_j = overlap / (2 * n - overlap)
    df = spark.createDataFrame(
        [("a", [int(v) for v in a]), ("b", [int(v) for v in b])],
        "conv_id string, shingles array<long>",
    )
    sk = SS.cset_sketch_np(df, m=m)
    pair = (
        sk.where(F.col("conv_id") == "a").select(F.col("cset").alias("ca"))
        .crossJoin(sk.where(F.col("conv_id") == "b").select(F.col("cset").alias("cb")))
    )
    u_col, i_col = SS.cset_union_intersection_cols(F.col("ca"), F.col("cb"), m)
    row = pair.select(
        SS.cset_jaccard_col(F.col("ca"), F.col("cb"), m).alias("j"),
        u_col.alias("u"),
        i_col.alias("i"),
    ).collect()[0]
    sigma = (true_j * (1 - true_j) / m) ** 0.5
    assert abs(row.j - true_j) <= 3 * sigma, (row.j, true_j)
    assert abs(row.u - (2 * n - overlap)) / (2 * n - overlap) < 0.15
    assert abs(row.i - overlap) / overlap < 0.35  # intersection amplifies err


def test_setsketch_quantized(spark):
    """Quantization: K = clamp(1 - log(x/a)/log b); max-merge of quantized
    == quantize of min-merge (monotone), and the quantized estimators
    track the continuous ones."""
    m = 256
    n = 3000
    a = _distinct(n)
    b = _distinct(n, off=n - 1000)
    df = spark.createDataFrame(
        [("a", [int(v) for v in a]), ("b", [int(v) for v in b])],
        "conv_id string, shingles array<long>",
    )
    sk = SS.cset_sketch_np(df, m=m)
    q = sk.select(
        "conv_id",
        F.col("cset").alias("c"),
        SS.setsketch_quantize_col(F.col("cset")).alias("k"),
    )
    rows = {r.conv_id: r for r in q.collect()}
    # monotone-merge identity: max of quantized == quantize of min-merged
    kmin = np.maximum(np.array(rows["a"].k), np.array(rows["b"].k))
    cont_merge = np.minimum(np.array(rows["a"].c), np.array(rows["b"].c))
    df2 = spark.createDataFrame(
        [(cont_merge.tolist(),)], "x array<double>"
    ).select(SS.setsketch_quantize_col(F.col("x")).alias("k"))
    assert df2.collect()[0].k == kmin.tolist()
    # quantized cardinality ~ truth
    est = (
        q.where(F.col("conv_id") == "a")
        .select(SS.setsketch_cardinality_col(F.col("k"), m).alias("e"))
        .collect()[0]
        .e
    )
    assert abs(est - n) / n < 4 / m ** 0.5 + 0.02, est
    # jaccard_by_ix ~ truth
    pair = (
        q.where(F.col("conv_id") == "a").select(F.col("k").alias("ka"))
        .crossJoin(q.where(F.col("conv_id") == "b").select(F.col("k").alias("kb")))
    )
    true_j = 1000 / (2 * n - 1000)
    jix = pair.select(
        SS.setsketch_jaccard_by_ix_col(F.col("ka"), F.col("kb"), m).alias("j")
    ).collect()[0].j
    assert abs(jix - true_j) < 0.1, (jix, true_j)


def test_jmle_jaccard():
    """ML Jaccard from gt/lt counts + cardinalities (jmle_simple,
    setsketch.h:91-115) on quantized planted-overlap sketches."""
    m = 1024
    n, overlap = 4000, 1600
    ra = SS.cset_registers_py(_distinct(n), m)
    rb = SS.cset_registers_py(_distinct(n, off=n - overlap), m)
    # quantize with 16-bit defaults
    import math

    def quant(x):
        k = math.floor(1.0 - math.log(x / SS.A16) / math.log(SS.B16))
        return max(0, min(SS.Q16 + 1, k))

    ka = np.array([quant(x) for x in ra])
    kb = np.array([quant(x) for x in rb])
    gt = int((ka > kb).sum())
    lt = int((ka < kb).sum())
    true_j = overlap / (2 * n - overlap)
    est = SS.jmle_jaccard_py(gt, lt, m, float(n), float(n), SS.B16)
    assert abs(est - true_j) < 0.06, (est, true_j)


def test_optimal_ab_fits_range(spark):
    """optimal_ab (reference python/sketch_ds/__init__.py:21-36): fitted
    (a, b) map maxv to register 0 and minv to register q under the
    quantizer K = clamp(floor(1 - log_b(x/a)), 0, q+1), reproduce the
    reference formula exactly, and recover the pinned ss.cpp defaults from
    their own design range."""
    import math

    maxv, minv, q = 37.5, 3.2e-7, 254
    a, b = SS.optimal_ab(maxv, minv, q=q)
    # reference formula parity (b = exp(ln(maxv/minv)/q), a = maxv/b)
    assert b == pytest.approx(math.exp(math.log(maxv / minv) / q))
    assert a == pytest.approx(maxv / b)
    # mapping property through the engine's own quantizer
    df = spark.createDataFrame([([maxv, minv],)], "regs array<double>")
    ks = df.select(
        SS.setsketch_quantize_col(F.col("regs"), b=b, a=a, q=q).alias("k")
    ).collect()[0].k
    # minv sits exactly on the last quantization edge; float rounding of
    # log_b may tip the floor one level either way (the reference's claim
    # is the idealized real-arithmetic one)
    assert ks[0] == 0 and ks[1] in (q - 1, q), ks
    # swapped-argument tolerance (reference swaps internally)
    assert SS.optimal_ab(minv, maxv, q=q) == pytest.approx((a, b))
    # defaults round-trip: the B16/A16 design range refits to B16/A16
    dmax = SS.A16 * SS.B16
    dmin = SS.A16 * SS.B16 ** (1 - SS.Q16)
    a16, b16 = SS.optimal_ab(dmax, dmin, q=SS.Q16)
    assert b16 == pytest.approx(SS.B16, rel=1e-9)
    assert a16 == pytest.approx(SS.A16, rel=1e-9)
