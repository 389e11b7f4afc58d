"""ntcard Card/VecCard (mult.h:178-337), LPCQF (lpcqf.h:129-520), and
VACSketch/PowerVACSketch (vac.h:16-125) — the last three SURVEY §2 rows.

Test strategy mirrors the reference's (SURVEY §5): planted-truth
multisets with known F0/multiplicity histograms, register-exactness vs a
pure-numpy twin of the C++ ingest loop, and merge/saturation laws.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketch_spark.functions.hashing import wanghash_np
from sketch_spark.operators.frequency import (
    lpcqf_inner_product,
    lpcqf_query,
    lpcqf_sketch,
)
from sketch_spark.operators.ntcard import (
    ntcard_buckets,
    ntcard_estimate,
    ntcard_report_np,
)
from sketch_spark.operators.vac import (
    vac_distinct,
    vac_hll,
    vac_level_thresholds,
    vac_levels,
)

SEED = 1337


# ---------------------------------------------------------------------------
# ntcard
# ---------------------------------------------------------------------------


def _ntcard_ingest_np(hashes: np.ndarray, r: int, p: int, maxcnt: int) -> np.ndarray:
    """Literal twin of Card::add (mult.h:246-262), 64-bit hashes."""
    counters = np.zeros(2 << r, dtype=np.int64)
    pshift = 64 - p
    for v in np.asarray(hashes, dtype=np.uint64):
        v = int(v)
        lastbit = (v >> (pshift - 1)) & 1
        if v >> pshift:
            continue
        b = (v & ((1 << r) - 1)) + (lastbit << r)
        if counters[b] != maxcnt:
            counters[b] += 1
    return counters


def test_ntcard_buckets_register_exact(spark):
    rng = np.random.default_rng(SEED)
    keys = rng.integers(0, 1 << 62, size=4000, dtype=np.uint64)
    # plant multiplicity: repeat a quarter of the keys 3x
    keys = np.concatenate([keys, np.repeat(keys[:1000], 2)])
    hashes = wanghash_np(keys)
    r, p, maxcnt = 5, 1, 3
    truth = _ntcard_ingest_np(hashes, r, p, maxcnt)

    pdf = pd.DataFrame({"g": "x", "h": hashes.astype(np.int64)})
    df = spark.createDataFrame(pdf)
    # signed->unsigned convention: reference hashes are full 64-bit; the
    # Spark path uses shiftrightunsigned so negative longs reinterpret
    # correctly as the same uint64 bit pattern.
    got = (
        ntcard_buckets(df, "g", "h", r=r, p=p, maxcnt=maxcnt)
        .orderBy("bucket")
        .toPandas()
    )
    nz = np.flatnonzero(truth)
    assert got["bucket"].tolist() == nz.tolist()
    assert got["cnt"].tolist() == truth[nz].tolist()


def test_ntcard_report_recursion_matches_reference_formula():
    # tiny hand-checkable counter table: r=2 (4 cells/half)
    counters = np.array([0, 1, 1, 2, 0, 0, 1, 2], dtype=np.int64)
    r, p = 2, 3
    f = ntcard_report_np(counters, r, p)
    # literal transliteration of mult.h:278-330
    nvals = 3
    arr = np.zeros((2, nvals))
    for i in range(2):
        for j in range(4):
            arr[i, counters[i * 4 + j]] += 1
    pmeans = (arr[0] + arr[1]) / 2
    logpm0 = np.log(pmeans[0])
    lpmml2r = logpm0 - r * np.log(2)
    exp = np.zeros(nvals)
    exp[0] = -lpmml2r * (1 << (p + r))
    exp[1] = -pmeans[1] / (pmeans[0] * lpmml2r)
    exp[2] = -pmeans[2] / (pmeans[0] * logpm0) - (1 * pmeans[1] * exp[1]) / (
        2 * pmeans[0]
    )
    exp[1:] = np.abs(exp[1:] * exp[0])
    assert np.allclose(f, exp)


def test_ntcard_estimate_planted_truth(spark):
    # 30k distinct keys, two multiplicity classes: 24k singletons + 6k
    # keys seen 3x.  F0 should come back within ~12% at r=10,p=2 and the
    # f_i profile should put most mass on i=1 with a visible i=3 bump.
    rng = np.random.default_rng(SEED)
    keys = rng.integers(0, 1 << 62, size=30_000, dtype=np.uint64)
    stream = np.concatenate([keys, np.repeat(keys[:6_000], 2)])
    hashes = wanghash_np(stream)
    pdf = pd.DataFrame({"g": "x", "h": hashes.astype(np.int64)})
    df = spark.createDataFrame(pdf)
    r, p = 10, 5
    buckets = ntcard_buckets(df, "g", "h", r=r, p=p, maxcnt=255)
    est = ntcard_estimate(buckets, r=r, p=p).collect()[0]
    assert est["g"] == "x"
    # literal mult.h report() returns HALF the truth (the selector bit's
    # per-half 1/2 sample is not folded back — see ntcard.py parity note);
    # assert the halved law, i.e. 2*f0 ~= D.
    assert abs(2 * est["f0"] - 30_000) / 30_000 < 0.12
    f_i = est["f_i"]
    # singleton class is accurate under the same halved-law (truth 24k)
    assert abs(2 * f_i[0] - 24_000) / 24_000 < 0.12
    # deeper classes inherit the reference's un-normalized log for i>=2
    # (mult.h:325-327, see ntcard.py parity note) — assert only the
    # structural fact the literal estimator preserves: singletons dominate.
    assert f_i[0] > 3 * max(f_i[1:])


def test_ntcard_saturation_commutes_with_merge(spark):
    # exact-count-then-clamp == clamped-add: split the stream in two,
    # union the bucket tables, re-aggregate with the clamp = whole-stream
    # build (the operator+= law, mult.h:225-244, under saturation).
    rng = np.random.default_rng(SEED + 1)
    stream = np.repeat(rng.integers(0, 1 << 62, 400, dtype=np.uint64), 8)
    hashes = wanghash_np(stream)
    r, p, maxcnt = 4, 0, 5
    pdf = pd.DataFrame({"g": "x", "h": hashes.astype(np.int64)})
    df = spark.createDataFrame(pdf)
    whole = ntcard_buckets(df, "g", "h", r=r, p=p, maxcnt=maxcnt)
    # merge of halves: sum the *unclamped* per-half counts then clamp —
    # relationally that is simply rebuilding from the union, which the
    # partial+final agg already does; assert the clamp is a post-filter
    # (no bucket exceeds maxcnt, counts match the numpy twin).
    truth = _ntcard_ingest_np(hashes, r, p, maxcnt)
    got = whole.orderBy("bucket").toPandas()
    assert got["cnt"].max() <= maxcnt
    nz = np.flatnonzero(truth)
    assert got["bucket"].tolist() == nz.tolist()
    assert got["cnt"].tolist() == truth[nz].tolist()


# ---------------------------------------------------------------------------
# LPCQF
# ---------------------------------------------------------------------------


def test_lpcqf_exact_counts_and_false_positives(spark):
    # tiny table (nregs=8, sigbits=2) forces (bucket, sig) collisions;
    # simulate the reference's logical cells in numpy and compare.
    rng = np.random.default_rng(SEED)
    keys = rng.integers(0, 1 << 32, size=500, dtype=np.uint64)
    nregs, sigbits = 8, 2
    hv = wanghash_np(keys)
    bucket = (hv % np.uint64(nregs)).astype(np.int64)
    sig = (hv & np.uint64((1 << sigbits) - 1)).astype(np.int64)
    cells: dict[tuple[int, int], int] = {}
    for b, s in zip(bucket, sig):
        cells[(int(b), int(s))] = cells.get((int(b), int(s)), 0) + 1

    pdf = pd.DataFrame({"k": keys.astype(np.int64)})
    df = spark.createDataFrame(pdf)
    sk = lpcqf_sketch(df, "k", nregs=nregs, sigbits=sigbits)
    got = {(r["bucket"], r["sig"]): r["cnt"] for r in sk.collect()}
    assert got == cells

    # point query: every key's estimate equals its cell count (>= its true
    # count — the false-positive law)
    uniq = pd.DataFrame({"k": np.unique(keys).astype(np.int64)})
    est = lpcqf_query(
        sk, spark.createDataFrame(uniq), "k", nregs=nregs, sigbits=sigbits
    ).toPandas()
    true_cnt = pd.Series(keys).value_counts()
    for _, row in est.iterrows():
        k = np.uint64(row["k"])
        h = wanghash_np(np.array([k], dtype=np.uint64))[0]
        cell = cells[(int(h % np.uint64(nregs))), int(h & np.uint64(3))]
        assert row["est_count"] == cell
        assert row["est_count"] >= true_cnt[int(k)]


def test_lpcqf_inner_product_matches_cellwise(spark):
    rng = np.random.default_rng(SEED + 2)
    a = rng.integers(0, 1 << 20, size=300, dtype=np.uint64)
    b = rng.integers(0, 1 << 20, size=300, dtype=np.uint64)
    nregs, sigbits = 1 << 10, 8
    ska = lpcqf_sketch(
        spark.createDataFrame(pd.DataFrame({"k": a.astype(np.int64)})), "k",
        nregs=nregs, sigbits=sigbits,
    )
    skb = lpcqf_sketch(
        spark.createDataFrame(pd.DataFrame({"k": b.astype(np.int64)})), "k",
        nregs=nregs, sigbits=sigbits,
    )
    got = lpcqf_inner_product(ska, skb).collect()[0]["inner_product"]

    def cellmap(keys):
        hv = wanghash_np(keys)
        cells: dict[tuple[int, int], int] = {}
        for h in hv:
            c = (int(h % np.uint64(nregs)), int(h & np.uint64((1 << sigbits) - 1)))
            cells[c] = cells.get(c, 0) + 1
        return cells

    ca, cb = cellmap(a), cellmap(b)
    exp = sum(v * cb.get(k, 0) for k, v in ca.items())
    assert got == exp
    # and the estimate upper-bounds the true join size
    true_js = sum(
        int(np.sum(a == k)) * int(np.sum(b == k)) for k in np.unique(a)
    )
    assert got >= true_js


# ---------------------------------------------------------------------------
# VACSketch
# ---------------------------------------------------------------------------


def test_vac_level_law_base2(spark):
    # level i membership <=> draw % 2^i == 0 <=> ctz(draw) >= i; verify
    # against a literal ctz twin of vac.h:37-42.
    rng = np.random.default_rng(SEED)
    draws = rng.integers(0, 1 << 62, size=2000, dtype=np.uint64)
    n = 6
    pdf = pd.DataFrame(
        {"rid": np.arange(len(draws)), "u": draws.astype(np.int64)}
    )
    lv = (
        vac_levels(spark.createDataFrame(pdf), "u", n=n)
        .groupBy("rid")
        .agg(F.max("level").alias("max_level"), F.count(F.lit(1)).alias("n_levels"))
        .toPandas()
        .set_index("rid")
        .sort_index()
    )

    def ctz(x: int) -> int:
        return (x & -x).bit_length() - 1 if x else 64

    for rid, u in enumerate(draws):
        end = min(ctz(int(u)) + 1, n)
        assert lv.loc[rid, "n_levels"] == end
        assert lv.loc[rid, "max_level"] == end - 1


def test_vac_power_thresholds_match_reference_lut():
    # construct_power_table (vac.h:60-72): lut[i] = 2^64 / base^i
    thr = vac_level_thresholds(1.5, 5)
    assert thr[0] == 1 << 64
    for i in range(1, 5):
        assert thr[i] == int((1 << 64) / (1.5 ** i))
    with pytest.raises(ValueError):
        vac_level_thresholds(1.0, 3)


def test_vac_distinct_multiplicity_sensitivity(spark):
    # per-occurrence sampling: a key with multiplicity c reaches level i
    # with prob 1-(1-2^-i)^c, so hot keys survive deeper.  Plant 50 keys
    # seen 64x and 3000 singletons: at level 5 (2^-5 sample) expect ~
    # 86% of hot keys present vs ~3% of singletons.
    rng = np.random.default_rng(SEED)
    hot = rng.integers(0, 1 << 40, size=50, dtype=np.uint64)
    cold = rng.integers(1 << 41, 1 << 42, size=3000, dtype=np.uint64)
    stream = np.concatenate([np.repeat(hot, 64), cold])
    rids = np.arange(len(stream), dtype=np.uint64)
    # per-occurrence draw: hash of the unique row id
    draws = wanghash_np(rids)
    pdf = pd.DataFrame(
        {
            "g": "x",
            "k": stream.astype(np.int64),
            "u": draws.astype(np.int64),
        }
    )
    prof = (
        vac_distinct(spark.createDataFrame(pdf), "g", "k", "u", n=6)
        .orderBy("level")
        .toPandas()
    )
    assert prof["level"].tolist() == list(range(6))
    assert prof.loc[0, "n_distinct"] == 3050
    assert prof.loc[0, "n_occurrences"] == len(stream)
    lvl5 = prof.loc[5]
    # hot keys dominate the deep level
    assert lvl5["n_distinct"] < 300
    assert lvl5["n_distinct"] >= 30


def test_vac_hll_registers_match_per_level(spark):
    from sketch_spark.operators.hll import hll_registers_np

    rng = np.random.default_rng(SEED + 3)
    keys = rng.integers(0, 1 << 62, size=1500, dtype=np.uint64)
    rids = np.arange(len(keys), dtype=np.uint64)
    draws = wanghash_np(rids + np.uint64(77))
    khash = wanghash_np(keys)
    n, p = 4, 6
    pdf = pd.DataFrame(
        {
            "g": "x",
            "h": khash.astype(np.int64),
            "u": draws.astype(np.int64),
        }
    )
    got = (
        vac_hll(spark.createDataFrame(pdf), "g", "h", "u", n=n, p=p)
        .orderBy("level")
        .toPandas()
    )
    assert got["level"].tolist() == list(range(n))

    def ctz(x: int) -> int:
        return (x & -x).bit_length() - 1 if x else 64

    for level in range(n):
        members = khash[
            np.array([min(ctz(int(u)) + 1, n) > level for u in draws])
        ]
        exp = hll_registers_np(members, p)
        assert got.loc[level, "g"] == "x"
        assert list(got.loc[level, "regs"]) == list(exp)


def test_vac_hll_group_key_exact_for_nulls_and_separator_strings(spark):
    """The (group, level) key rides through the register agg as a STRUCT:
    NULL groups must come back as NULL (the earlier concat_ws encoding
    silently reassigned them to a phantom group named after the level) and
    a group value containing the old \\x1f separator byte must round-trip
    verbatim.  Registers per (group, level) must match the per-level
    expectation regardless of key shape."""
    from sketch_spark.operators.hll import hll_registers_np

    rng = np.random.default_rng(SEED + 9)
    n, p = 3, 4
    groups = [None, "x\x1fy", "plain"]
    rows = []
    members: dict = {}
    for gi, g in enumerate(groups):
        keys = rng.integers(0, 1 << 62, size=400, dtype=np.uint64)
        rids = np.arange(len(keys), dtype=np.uint64) + np.uint64(10_000 * gi)
        draws = wanghash_np(rids + np.uint64(5))
        khash = wanghash_np(keys)
        members[g] = (khash, draws)
        rows += [
            (g, int(np.int64(h)), int(np.int64(u)))
            for h, u in zip(khash, draws)
        ]
    pdf = pd.DataFrame(rows, columns=["g", "h", "u"])
    got = vac_hll(
        spark.createDataFrame(pdf), "g", "h", "u", n=n, p=p
    ).toPandas()
    assert len(got) == len(groups) * n

    def ctz(x: int) -> int:
        return (x & -x).bit_length() - 1 if x else 64

    for g in groups:
        khash, draws = members[g]
        sub = got[got["g"].isna()] if g is None else got[got["g"] == g]
        assert sorted(sub["level"]) == list(range(n)), g
        for level in range(n):
            keep = np.array(
                [min(ctz(int(u)) + 1, n) > level for u in draws]
            )
            exp = hll_registers_np(khash[keep], p)
            row = sub[sub["level"] == level].iloc[0]
            assert list(row["regs"]) == list(exp), (g, level)


def test_ntcard_estimate_corrected_scales_2x(spark):
    """corrected=True applies the documented 2x factor to f0 and every
    f_i (round-5 ADVICE: naive consumers of the literal values got ~D/2)."""
    rng = np.random.default_rng(SEED + 1)
    keys = rng.integers(0, 1 << 62, size=30_000, dtype=np.uint64)
    hashes = wanghash_np(keys)
    df = spark.createDataFrame(pd.DataFrame({"g": "x", "h": hashes.astype(np.int64)}))
    r, p = 10, 5
    buckets = ntcard_buckets(df, "g", "h", r=r, p=p, maxcnt=255)
    lit = ntcard_estimate(buckets, r=r, p=p).collect()[0]
    cor = ntcard_estimate(buckets, r=r, p=p, corrected=True).collect()[0]
    assert cor["f0"] == pytest.approx(2 * lit["f0"])
    assert np.allclose(np.asarray(cor["f_i"]), 2 * np.asarray(lit["f_i"]))
    # and the corrected value is the one near truth
    assert abs(cor["f0"] - 30_000) / 30_000 < 0.15
