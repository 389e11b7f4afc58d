"""Weighted MinHash tier (reference bmh.h BagMinHash / ProbMinHash):
probability-Jaccard collision law of prob_minhash_np, and the exact
integer-weight expansion reduction."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketch_spark.operators import minhash as MH


def _wset(pairs):
    return [{"h": h, "cnt": c} for h, c in pairs]


A = [(101, 3), (202, 1), (303, 2), (404, 5), (505, 1)]
B = [(101, 1), (202, 1), (303, 4), (606, 2)]


def _sig_df(spark, m):
    df = spark.createDataFrame(
        [("a", _wset(A)), ("b", _wset(B))],
        "conv_id string, minimizers array<struct<h long, cnt long>>",
    )
    sigs = MH.prob_minhash_np(df, m=m)
    return {r.conv_id: r.psig for r in sigs.collect()}


def test_prob_minhash_collision_law(spark):
    """Fraction of equal registers estimates PROBABILITY Jaccard J_P
    (Ertl), within 3 binomial sigmas at m=2048."""
    m = 2048
    sig = _sig_df(spark, m)
    frac = sum(1 for x, y in zip(sig["a"], sig["b"]) if x == y) / m
    jp = MH.prob_jaccard_py(A, B)
    sigma = (jp * (1 - jp) / m) ** 0.5
    assert abs(frac - jp) <= 3 * sigma + 1e-9, (frac, jp)


def test_prob_minhash_determinism_and_identity(spark):
    m = 256
    df = spark.createDataFrame(
        [("x", _wset(A)), ("y", _wset(A)), ("empty", [])],
        "conv_id string, minimizers array<struct<h long, cnt long>>",
    )
    got = {r.conv_id: r.psig for r in MH.prob_minhash_np(df, m=m).collect()}
    assert got["x"] == got["y"]  # equal weighted sets -> equal signatures
    assert got["empty"] is None
    # winners are drawn from the set's own element hashes
    assert set(got["x"]) <= {h for h, _ in A}


def test_prob_minhash_disjoint_never_collides(spark):
    m = 512
    disj = [(999_001 + i, 2) for i in range(5)]
    df = spark.createDataFrame(
        [("a", _wset(A)), ("d", _wset(disj))],
        "conv_id string, minimizers array<struct<h long, cnt long>>",
    )
    got = {r.conv_id: r.psig for r in MH.prob_minhash_np(df, m=m).collect()}
    assert sum(1 for x, y in zip(got["a"], got["d"]) if x == y) == 0


AF = [(101, 2.75), (202, 0.31), (303, 1.9), (404, 5.25), (505, 0.04)]
BF = [(101, 0.9), (202, 0.31), (303, 4.4), (606, 2.2)]


def test_prob_minhash_float_weights_collision_law(spark):
    """pmh2 parity (bmh.h:439-701): arbitrary positive FLOAT weights, same
    probability-Jaccard collision law, mirroring bagminhashtest.cpp's
    planted weighted truth."""
    m = 2048
    df = spark.createDataFrame(
        [
            ("a", [{"h": h, "w": w} for h, w in AF]),
            ("b", [{"h": h, "w": w} for h, w in BF]),
        ],
        "conv_id string, minimizers array<struct<h long, w double>>",
    )
    got = {
        r.conv_id: r.psig
        for r in MH.prob_minhash_np(df, m=m, weight_field="w").collect()
    }
    frac = sum(1 for x, y in zip(got["a"], got["b"]) if x == y) / m
    jp = MH.prob_jaccard_py(AF, BF)
    sigma = (jp * (1 - jp) / m) ** 0.5
    assert abs(frac - jp) <= 3 * sigma + 1e-9, (frac, jp)


def test_prob_minhash_float_scale_invariance(spark):
    """J_P is scale-free: multiplying every weight by a constant must give
    the IDENTICAL signature (the exponential race only sees ratios...
    almost: t scales by 1/c uniformly, so argmins are unchanged)."""
    df = spark.createDataFrame(
        [
            ("x", [{"h": h, "w": w} for h, w in AF]),
            ("y", [{"h": h, "w": w * 8.0} for h, w in AF]),
        ],
        "conv_id string, minimizers array<struct<h long, w double>>",
    )
    got = {
        r.conv_id: r.psig
        for r in MH.prob_minhash_np(df, m=256, weight_field="w").collect()
    }
    assert got["x"] == got["y"]


def test_prob_minhash_blockwise_matches_global(spark):
    """The streaming-block running min must equal the one-shot matrix
    argmin (ties break to the earliest element in both)."""
    import sketch_spark.operators.minhash as mh_mod

    rng = np.random.default_rng(11)
    elems = [
        {"h": int(h), "w": float(w)}
        for h, w in zip(
            rng.integers(0, 2**60, 300), rng.uniform(0.01, 9.0, 300)
        )
    ]
    df = spark.createDataFrame(
        [("z", elems)], "conv_id string, minimizers array<struct<h long, w double>>"
    )
    full = {
        r.conv_id: r.psig
        for r in MH.prob_minhash_np(df, m=128, weight_field="w").collect()
    }
    # numpy oracle: one-shot full-matrix argmin over the same clocks
    golden = np.uint64(mh_mod._PMH_GOLDEN)
    hs = np.array([e["h"] for e in elems], dtype=np.int64).astype(np.uint64)
    ws = np.array([e["w"] for e in elems])
    js = np.arange(128, dtype=np.uint64)
    with np.errstate(over="ignore"):
        mixed = mh_mod.wanghash_np(hs[:, None] + golden * js[None, :])
    u = (mixed.astype(np.float64) + 1.0) / 18446744073709551616.0
    t = -np.log(u) / ws[:, None]
    want = hs[np.argmin(t, axis=0)].astype(np.int64).tolist()
    assert full["z"] == want


def test_tfidf_walk_py_hand_case():
    """Literal mh.h:366-391 trace on A/B: three matched hashes (101/202/303),
    then 404 and 505 from A alone, at which point i1 == lsz and the walk
    breaks — 606 is never visited."""
    num, den = MH.tfidf_walk_py(sorted(A), sorted(B))
    assert (num, den) == (1 + 1 + 2, 3 + 1 + 4 + 5 + 1)
    # walk is asymmetric: starting from B the step budget is lsz=4, so the
    # 4th step consumes 404 from A's side and the budget ends the walk
    num_ba, den_ba = MH.tfidf_walk_py(sorted(B), sorted(A))
    assert (num_ba, den_ba) == (1 + 1 + 2, 3 + 1 + 4 + 5)
    assert MH.tfidf_walk_py([], sorted(B)) == (0, 0)
    assert MH.tfidf_walk_py(sorted(A), []) == (0, 0)
    sa = sorted(A)
    n_id, d_id = MH.tfidf_walk_py(sa, sa)
    assert n_id == d_id == sum(c for _, c in A)


def test_tfidf_walk_cols_matches_py(spark):
    """The set-wise JVM expression must equal the sequential reference walk
    on randomized hash-sorted weighted signatures, including exhaustion
    from either side and the nused budget."""
    rng = np.random.default_rng(7)
    rows = []
    expect = {}
    for i in range(60):
        la = int(rng.integers(1, 12))
        lb = int(rng.integers(1, 12))
        universe = rng.choice(40, size=18, replace=False)
        a = sorted(
            (int(h), int(rng.integers(1, 9)))
            for h in rng.choice(universe, size=la, replace=False)
        )
        b = sorted(
            (int(h), int(rng.integers(1, 9)))
            for h in rng.choice(universe, size=lb, replace=False)
        )
        rows.append((str(i), _wset(a), _wset(b)))
        expect[str(i)] = MH.tfidf_walk_py(a, b)
    df = spark.createDataFrame(
        rows,
        "pid string, ma array<struct<h long, cnt long>>, "
        "mb array<struct<h long, cnt long>>",
    )
    num, den = MH.tfidf_walk_cols(F.col("ma"), F.col("mb"))
    got = {
        r.pid: (r.num, r.den)
        for r in df.select("pid", num.alias("num"), den.alias("den")).collect()
    }
    assert got == expect


def test_prob_jaccard_py_bounds():
    jp = MH.prob_jaccard_py(A, B)
    jw = MH.weighted_jaccard_py(A, B)
    assert 0.0 < jp < 1.0
    assert 0.0 < jw < 1.0
    assert MH.prob_jaccard_py(A, A) == pytest.approx(1.0)


def test_expand_weighted_exact_reduction(spark):
    """Plain Jaccard of the (h, level) expansions equals sum(min)/sum(max)
    of the weighted sets — the exact identity that lets the unweighted
    one-perm/LSH stack serve weighted dedup."""
    df = spark.createDataFrame(
        [("a", h, c) for h, c in A] + [("b", h, c) for h, c in B],
        "conv_id string, h long, cnt long",
    )
    ex = MH.expand_weighted_elements(df)
    sets = {}
    for r in ex.collect():
        sets.setdefault(r.conv_id, set()).add(r.h)
    inter = len(sets["a"] & sets["b"])
    union = len(sets["a"] | sets["b"])
    assert inter / union == pytest.approx(MH.weighted_jaccard_py(A, B))
    # per-set sizes = total weights
    assert len(sets["a"]) == sum(c for _, c in A)
    assert len(sets["b"]) == sum(c for _, c in B)


def test_expanded_one_perm_estimates_weighted_jaccard(spark):
    """End-to-end: expansion -> one-perm signatures -> register-equality
    fraction tracks the weighted Jaccard (merge/agg machinery unchanged)."""
    rng = np.random.default_rng(3)
    big_a = [(int(h), int(rng.integers(1, 6))) for h in rng.integers(0, 2**40, 60)]
    big_b = [(h, max(1, c + int(rng.integers(-1, 2)))) for h, c in big_a[:40]] + [
        (int(h), int(rng.integers(1, 6))) for h in rng.integers(2**41, 2**42, 20)
    ]
    df = spark.createDataFrame(
        [("a", h, c) for h, c in big_a] + [("b", h, c) for h, c in big_b],
        "conv_id string, h long, cnt long",
    )
    ex = MH.expand_weighted_elements(df)
    sig = MH.densify_signatures(MH.one_perm_signature(ex, p=7), p=7)
    got = {r.conv_id: r.sig for r in sig.collect()}
    frac = sum(1 for x, y in zip(got["a"], got["b"]) if x == y) / 128
    jw = MH.weighted_jaccard_py(big_a, big_b)
    assert abs(frac - jw) <= 3 * (jw * (1 - jw) / 128) ** 0.5 + 0.02, (frac, jw)


def test_prob_minhash_degenerate_weights_null_not_sentinel(spark):
    """Rows whose weights are all non-positive/NaN must get a NULL
    signature (like empty rows), never the all-zero sentinel — two
    unrelated degenerate rows must not compare as J_P = 1.0 (review r4).
    Mixed rows simply drop the degenerate elements."""
    m = 128
    df = spark.createDataFrame(
        [
            ("z1", [{"h": 11, "w": 0.0}, {"h": 22, "w": -1.0}]),
            ("z2", [{"h": 33, "w": 0.0}, {"h": 44, "w": float("nan")}]),
            ("mix", [{"h": 101, "w": 2.75}, {"h": 999, "w": 0.0}]),
            ("ref", [{"h": 101, "w": 2.75}]),
        ],
        "conv_id string, minimizers array<struct<h long, w double>>",
    )
    got = {
        r.conv_id: r.psig
        for r in MH.prob_minhash_np(df, m=m, weight_field="w").collect()
    }
    assert got["z1"] is None and got["z2"] is None
    # zero-weight element contributes nothing: mix == its positive support
    assert got["mix"] == got["ref"]
    assert set(got["ref"]) == {101}
