"""Hash-function parity tests (reference semantics, SURVEY.md §2.2)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketch_spark.functions import hashing as H
from sketch_spark.functions import text as T

U64 = np.uint64


def test_wanghash_known_values():
    # WangHash is a bijection (reference hash.h:42-63); spot-check the
    # algebraic definition against an independent pure-int implementation.
    def ref(key: int) -> int:
        M = (1 << 64) - 1
        key = ((~key & M) + (key << 21)) & M
        key ^= key >> 24
        key = (key + (key << 3) + (key << 8)) & M
        key ^= key >> 14
        key = (key + (key << 2) + (key << 4)) & M
        key ^= key >> 28
        key = (key + (key << 31)) & M
        return key

    xs = [0, 1, 2, 1337, 2**63, 2**64 - 1, 0x9E3779B97F4A7C15]
    got = H.wanghash_np(np.array(xs, dtype=U64))
    assert [int(v) for v in got] == [ref(x) for x in xs]


def test_wanghash_bijection_roundtrip():
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 2**64, size=1000, dtype=U64)
    assert (H.wanghash_inv_np(H.wanghash_np(xs)) == xs).all()


def test_wanghash_column_matches_numpy(spark):
    xs = np.array([0, 1, 2**63, 2**64 - 1, 1337, 42], dtype=U64)
    df = spark.createDataFrame([(int(np.int64(v)),) for v in xs], ["x"])
    got = [r.w for r in df.select(H.wanghash_col(F.col("x")).alias("w")).collect()]
    assert got == H.wanghash_np(xs).astype(np.int64).tolist()


def test_xxh64_matches_spark_builtin(spark):
    strs = ["", "a", "hello world", "x" * 100, "\x1e".join(["t1", "t2", "t3"])]
    df = spark.createDataFrame([(s,) for s in strs], ["s"])
    rows = df.select("s", F.xxhash64("s").alias("h")).collect()
    for r in rows:
        assert H.xxh64_py(r.s.encode()) == r.h
    dfl = spark.createDataFrame([(i,) for i in [0, -1, 2**40, -(2**40)]], ["v"])
    for r in dfl.select("v", F.xxhash64("v").alias("h")).collect():
        assert H.xxh64_long_py(r.v) == r.h


def test_poly_hash_matches_python(spark):
    texts = ["hello world foo", "a b c d", ""]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows = df.select(
        "text",
        F.transform(T.tokens_col(F.col("text")), H.poly_hash_token_col).alias("th"),
        T.poly_shingle_hashes_col(F.col("text"), 3).alias("sh"),
    ).collect()
    for r in rows:
        toks = r.text.split()
        assert r.th == [H.poly_hash_py(t) for t in toks]
        exp = [
            H.poly_combine_py([H.poly_hash_py(t) for t in toks[i : i + 3]])
            for i in range(max(len(toks) - 2, 0))
        ]
        assert r.sh == exp


def test_shingle_window_semantics(spark):
    # L items -> max(L-n+1, 0) shingles (reference util.cpp:47-68)
    df = spark.createDataFrame([("a b",), ("a b c",), ("a b c d",)], ["text"])
    sizes = [
        r.n
        for r in df.select(
            F.size(T.word_shingles_col(T.tokens_col(F.col("text")), 3)).alias("n")
        ).collect()
    ]
    assert sizes == [0, 1, 2]


def test_murfinhash_parity(spark):
    """MurFinHash (hash.h:466-476): numpy, scalar and Column agree
    bit-exactly; the finalizer is well-mixing (no fixed point at small
    ints)."""
    import numpy as np

    from sketch_spark.functions.hashing import (
        murfinhash_col,
        murfinhash_np,
        murfinhash_py,
    )

    vals = [0, 1, 2, 1337, 2**63 - 1, 2**64 - 1, 0xDEADBEEF]
    np_out = murfinhash_np(np.array(vals, dtype=np.uint64))
    for v, nv in zip(vals, np_out):
        assert murfinhash_py(v) == int(nv)
    signed = [v - (1 << 64) if v >= (1 << 63) else v for v in vals]
    df = spark.createDataFrame([(v,) for v in signed], "x long")
    got = [r.h for r in df.select(murfinhash_col(F.col("x")).alias("h")).collect()]
    expect = [int(n) - (1 << 64) if int(n) >= (1 << 63) else int(n) for n in np_out]
    assert got == expect
    assert murfinhash_py(1) not in (0, 1)
