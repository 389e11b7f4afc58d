"""HyperMinHash (hmh.h): register build, merge-as-union, cardinality via
the lzc histogram, and collision-corrected Jaccard on planted overlap."""

import numpy as np
from pyspark.sql import functions as F

from sketch_spark.functions.hashing import wanghash_np
from sketch_spark.operators import hyperminhash as HM


def _rows(name, n, off=0):
    hs = wanghash_np(np.arange(off, off + n, dtype=np.uint64)).astype(np.int64)
    return [(name, int(h)) for h in hs]


def test_hmh_register_structure(spark):
    p, rsize = 8, 16
    r = rsize - HM.Q_LZC
    df = spark.createDataFrame(_rows("a", 3000), "g string, h long")
    regs = HM.hmh_registers(df, "g", "h", p=p, rsize=rsize).collect()[0].regs
    assert len(regs) == 1 << p
    arr = np.array(regs)
    nz = arr[arr > 0]
    assert nz.size > 200  # 3000 elements over 256 buckets: almost all filled
    lzc = nz >> r
    assert lzc.min() >= 1 and lzc.max() <= 64 - p + 1
    assert (nz & ((1 << r) - 1)).max() < (1 << r)


def test_hmh_merge_is_union(spark):
    p = 8
    a, b = _rows("a", 1500), _rows("b", 1500, off=1000)
    union = [("u", h) for _, h in {(0, h): None for _, h in a + b} or []]
    union = [("u", h) for h in sorted({h for _, h in a + b})]
    df = spark.createDataFrame(a + b + union, "g string, h long")
    got = {r.g: np.array(r.regs) for r in HM.hmh_registers(df, "g", "h", p=p).collect()}
    assert np.array_equal(np.maximum(got["a"], got["b"]), got["u"])


def test_hmh_cardinality(spark):
    p = 10
    df = spark.createDataFrame(
        _rows("a", 20_000) + _rows("b", 500, off=60_000), "g string, h long"
    )
    sk = HM.hmh_registers(df, "g", "h", p=p)
    got = {
        r.g: r.est
        for r in sk.select("g", HM.hmh_cardinality_udf(F.col("regs"), p).alias("est")).collect()
    }
    assert abs(got["a"] - 20_000) / 20_000 < 4 * 1.04 / (1 << p) ** 0.5
    assert abs(got["b"] - 500) / 500 < 4 * 1.04 / (1 << p) ** 0.5 + 0.02


def test_hmh_jaccard_planted_overlap(spark):
    p, rsize = 10, 16
    n, overlap = 8_000, 4_000
    true_j = overlap / (2 * n - overlap)
    df = spark.createDataFrame(
        _rows("a", n) + _rows("b", n, off=n - overlap), "g string, h long"
    )
    sk = HM.hmh_registers(df, "g", "h", p=p, rsize=rsize)
    pair = (
        sk.where(F.col("g") == "a").select(F.col("regs").alias("ra"))
        .crossJoin(sk.where(F.col("g") == "b").select(F.col("regs").alias("rb")))
    )
    cc_col, nc_col = HM.hmh_cc_nc_cols(F.col("ra"), F.col("rb"))
    row = pair.select(cc_col.alias("cc"), nc_col.alias("nc")).collect()[0]
    est = HM.hmh_jaccard_py(row.cc, row.nc, float(n), float(n), p, rsize)
    sigma = (true_j * (1 - true_j) / (1 << p)) ** 0.5
    assert abs(est - true_j) <= 4 * sigma + 0.02, (est, true_j)
    # self-jaccard = 1
    self_row = (
        sk.where(F.col("g") == "a")
        .select(
            HM.hmh_cc_nc_cols(F.col("regs"), F.col("regs"))[0].alias("cc"),
            HM.hmh_cc_nc_cols(F.col("regs"), F.col("regs"))[1].alias("nc"),
        )
        .collect()[0]
    )
    assert self_row.cc == self_row.nc


def test_hmh_expected_collisions_sane():
    # disjoint same-size sets at rsize=16: E_C is far below the filled
    # bucket count, so random collisions barely dent the estimator
    ec = HM.hmh_expected_collisions_py(10_000, 10_000, p=10, rsize=16)
    assert 0.0 < ec < 10.0
    # coarser mantissa (rsize=8, r=2) -> many more random collisions
    ec8 = HM.hmh_expected_collisions_py(10_000, 10_000, p=10, rsize=8)
    assert ec8 > ec
