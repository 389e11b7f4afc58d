"""HLL, Count-Min, top-k, SimHash, ANN, multimodal operator tests —
statistical tolerances mirror the reference suites (hlltest.cpp:62-88:
|est - truth| <= 2 * est_err; cmtest.cpp; sketch_test.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketch_spark.operators import ann, frequency, hll, multimodal, simhash


def _hashed_elems(spark, n, group="A", seed=1):
    rng = np.random.default_rng(seed)
    vals = np.unique(rng.integers(0, 2**64, size=n + 5000, dtype=np.uint64))
    rng.shuffle(vals)  # unique() sorts; a sorted prefix skews HLL buckets
    vals = vals[:n]
    return spark.createDataFrame(
        [(group, int(np.int64(v))) for v in vals], "g string, h long"
    )


@pytest.mark.parametrize("p,n", [(10, 5000), (12, 20000)])
def test_hll_estimate_within_2err(spark, p, n):
    df = _hashed_elems(spark, n)
    regs = hll.hll_registers(df, "g", "h", p)
    est = regs.select(hll.hll_estimate_col(F.col("regs"), p).alias("e")).collect()[0].e
    err = hll.hll_est_error(p)
    assert abs(est - n) <= 2 * err * n, (est, n)


def test_hll_merge_equals_union(spark):
    p = 10
    a = _hashed_elems(spark, 3000, "A", seed=2)
    b = _hashed_elems(spark, 3000, "B", seed=3)
    u = a.select(F.lit("U").alias("g"), "h").union(b.select(F.lit("U").alias("g"), "h"))
    regs = hll.hll_registers(a.union(b).union(u), "g", "h", p)
    rows = {r.g: r.regs for r in regs.collect()}
    merged = [max(x, y) for x, y in zip(rows["A"], rows["B"])]
    assert merged == list(rows["U"])


def test_hll_jaccard_estimate(spark):
    p = 12
    rng = np.random.default_rng(9)
    pool = np.unique(rng.integers(0, 2**64, size=40000, dtype=np.uint64))
    rng.shuffle(pool)
    a = pool[:20000]
    b = pool[10000:30000]  # true J = 10000/30000 = 1/3
    rows = [("A", int(np.int64(v))) for v in a] + [("B", int(np.int64(v))) for v in b]
    df = spark.createDataFrame(rows, "g string, h long")
    regs = hll.hll_registers(df, "g", "h", p)
    r = {x.g: x.regs for x in regs.collect()}
    pair = spark.createDataFrame([(r["A"], r["B"])], "a array<int>, b array<int>")
    j = pair.select(hll.hll_jaccard_col(F.col("a"), F.col("b"), p).alias("j")).collect()[0].j
    assert abs(j - 1 / 3) < 0.1


def test_cm_sketch_point_queries(spark):
    # skewed stream: key k appears (k+1)*50 times, k in 0..19
    rows = [(k,) for k in range(20) for _ in range((k + 1) * 50)]
    df = spark.createDataFrame(rows, "key int")
    cm = frequency.cm_sketch(df, "key", d=4, w=1 << 12)
    keys = spark.createDataFrame([(k,) for k in range(20)], "key int")
    est = {r.key: r.est_count for r in frequency.cm_query(cm, keys, "key", d=4, w=1 << 12).collect()}
    for k in range(20):
        true = (k + 1) * 50
        assert est[k] >= true  # CM never underestimates
        assert est[k] <= true + 200  # small stream, wide table: tight


def test_cm_sketch_decayed(spark):
    """Exponential-decay CM (realccm_t analog): an old occurrence
    contributes 2^(-age/half_life); estimates for a key seen long ago fade
    below a key seen now."""
    from datetime import datetime

    rows = [("hot", datetime(2026, 1, 1, 12, 0, 0))] * 10 + [
        ("cold", datetime(2026, 1, 1, 0, 0, 0))
    ] * 10
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    now = F.lit(datetime(2026, 1, 1, 12, 0, 0)).cast("timestamp")
    cm = frequency.cm_sketch_decayed(df, "k", "ts", now, half_life_s=3600.0, d=3, w=64)
    cells = {(r.seed, r.bucket): r.cnt for r in cm.collect()}
    # probe manually: min over seeds of matching cells
    import math

    def est(key):
        vals = []
        for s in range(3):
            b = df.sparkSession.range(1).select(
                F.pmod(F.xxhash64(F.lit(key), F.lit(s)), F.lit(64)).alias("b")
            ).collect()[0].b
            vals.append(cells.get((s, b), 0.0))
        return min(vals)

    assert abs(est("hot") - 10.0) < 1e-6
    assert est("cold") == pytest.approx(10 * 2 ** -12, rel=1e-6, abs=1e-9)


def test_bloom_cardinality_and_jaccard(spark):
    """Bloom bitset estimators (bf.h:83-90, 385-440): cardinality from bit
    density, Jaccard via union inversion."""
    from sketch_spark.operators import membership as MB

    n_bits, k = 8192, 4
    a_keys = spark.range(0, 900).select(F.col("id").alias("k"))
    b_keys = spark.range(600, 1500).select(F.col("id").alias("k"))
    ba = MB.bloom_build(a_keys, "k", n_bits, k).select(F.col("bits").alias("a"))
    bb = MB.bloom_build(b_keys, "k", n_bits, k).select(F.col("bits").alias("b"))
    row = ba.crossJoin(bb).select(
        MB.bloom_cardinality_col(F.col("a"), n_bits, k).alias("ca"),
        MB.bloom_jaccard_col(F.col("a"), F.col("b"), n_bits, k).alias("j"),
    ).collect()[0]
    assert abs(row.ca - 900) / 900 < 0.05, row.ca
    true_j = 300 / 1500
    assert abs(row.j - true_j) < 0.05, row.j


def test_one_perm_signature_mod(spark):
    """Non-pow2 register count (DivBBitMinHasher analog): m=100 buckets via
    pmod, equal sets give equal signatures, collision fraction tracks J."""
    from sketch_spark.operators import minhash as MH

    rng = np.random.default_rng(31)
    a = [int(v) for v in rng.integers(0, 2**62, 500)]
    b = a[:300] + [int(v) for v in rng.integers(2**62, 2**63, 200)]
    true_j = len(set(a) & set(b)) / len(set(a) | set(b))
    rows = [("a", h) for h in a] + [("b", h) for h in b] + [("a2", h) for h in a]
    df = spark.createDataFrame(rows, "conv_id string, h long")
    m = 100
    sig = {r.conv_id: r.sig for r in MH.one_perm_signature_mod(df, m=m).collect()}
    assert sig["a"] == sig["a2"]
    both = [
        (x, y) for x, y in zip(sig["a"], sig["b"]) if x is not None and y is not None
    ]
    frac = sum(1 for x, y in both if x == y) / len(both)
    assert abs(frac - true_j) <= 3 * (true_j * (1 - true_j) / m) ** 0.5 + 0.02


def test_count_sketch_point_and_joinsize(spark):
    """Count sketch (reference cs_t, ccm.h): signed-median point estimates
    are unbiased where Count-Min only overestimates, and the inner product
    of two sketches estimates the join size (join_size_l2est)."""
    rng = np.random.default_rng(17)
    # zipf-ish: key k appears ~ 2000/k times
    keys_a = [int(k) for k in rng.zipf(1.3, size=4000) if k < 1000]
    df_a = spark.createDataFrame([(k,) for k in keys_a], "k long")
    d, w = 5, 1 << 10
    cs = frequency.cs_sketch(df_a, "k", d, w)
    from collections import Counter

    truth = Counter(keys_a)
    top = [k for k, _ in truth.most_common(5)]
    keys_df = spark.createDataFrame([(k,) for k in top], "k long")
    est = {
        r.k: r.est_count
        for r in frequency.cs_query(cs, keys_df, "k", d, w).collect()
    }
    # additive error ~ ||f||_2 / sqrt(w) per row; median over 5 rows
    l2 = sum(v * v for v in truth.values()) ** 0.5
    tol = 4 * l2 / (w ** 0.5) + 2
    for k in top:
        assert abs(est[k] - truth[k]) <= tol, (k, est[k], truth[k])
    # join size vs a second multiset
    keys_b = [int(k) for k in rng.zipf(1.3, size=4000) if k < 1000]
    df_b = spark.createDataFrame([(k,) for k in keys_b], "k long")
    csb = frequency.cs_sketch(df_b, "k", d, w)
    est_js = frequency.cs_inner_product(cs, csb, d).collect()[0].est_join_size
    truth_b = Counter(keys_b)
    exact_js = sum(truth[k] * truth_b.get(k, 0) for k in truth)
    l2b = sum(v * v for v in truth_b.values()) ** 0.5
    js_tol = 4 * l2 * l2b / (w ** 0.5) + 2
    assert abs(est_js - exact_js) <= js_tol, (est_js, exact_js, js_tol)
    # F2 moment
    est_f2 = frequency.cs_l2_moment(cs, d).collect()[0].est_f2
    assert abs(est_f2 - l2 * l2) <= 4 * (2 / w) ** 0.5 * l2 * l2 + 2


def test_top_k_deterministic(spark):
    rows = [("a",)] * 5 + [("b",)] * 5 + [("c",)] * 3
    df = spark.createDataFrame(rows, "k string")
    got = [(r.k, r.cnt) for r in frequency.top_k(df, ["k"], 2).collect()]
    assert got == [("a", 5), ("b", 5)]


def test_simhash_matches_python_oracle(spark):
    rng = np.random.default_rng(4)
    arrs = [
        [int(np.int64(v)) for v in rng.integers(0, 2**64, size=n, dtype=np.uint64)]
        for n in (0, 1, 7, 200)
    ]
    df = spark.createDataFrame([(a,) for a in arrs], "shingles array<long>")
    got = [r.simhash for r in simhash.simhash_signatures(df).collect()]
    assert got == [simhash.simhash_py(a) for a in arrs]


def test_simhash_hamming_near_dup(spark):
    rng = np.random.default_rng(11)
    base = rng.integers(0, 2**64, size=300, dtype=np.uint64)
    near = base.copy()
    near[:15] = rng.integers(0, 2**64, size=15, dtype=np.uint64)  # 5% changed
    far = rng.integers(0, 2**64, size=300, dtype=np.uint64)
    df = spark.createDataFrame(
        [
            ("base", [int(np.int64(v)) for v in base]),
            ("near", [int(np.int64(v)) for v in near]),
            ("far", [int(np.int64(v)) for v in far]),
        ],
        "conv_id string, shingles array<long>",
    )
    sims = simhash.simhash_signatures(df)
    pairs = spark.createDataFrame(
        [("base", "near"), ("base", "far")], "a string, b string"
    )
    kept = {(r.a, r.b) for r in simhash.hamming_filter(pairs, sims, max_hamming=12).collect()}
    assert ("base", "near") in kept
    assert ("base", "far") not in kept


def test_ann_brute_force_vs_srp_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    exact = ann.brute_force_topk(emb, queries, k=5)
    approx = ann.srp_topk(emb, queries, k=5, band_bits=4)  # 16 bands of 4 bits
    ex = {(r.q_id, r.n_id) for r in exact.collect()}
    ap = {(r.q_id, r.n_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.6, recall  # 4-bit bands: high candidate rate


def test_srp_bucket_cap_and_maxcand(spark, sf_dir):
    """Hot-bucket bound: a tight bucket_cap + per-query maxcand must keep
    the join bounded WITHOUT collapsing recall (band-diversified ranks give
    every corpus vector n_bands independent draws — the lesson of the LSH
    root-link fix applies here too)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")  # 500 vectors
    queries = emb.where(F.col("vec_id") < 10)
    exact = ann.brute_force_topk(emb, queries, k=3)
    capped = ann.srp_topk(
        emb, queries, k=3, band_bits=4, bucket_cap=64, max_cand_per_query=100
    )
    ex = {(r.q_id, r.n_id) for r in exact.collect()}
    ap_rows = capped.collect()
    ap = {(r.q_id, r.n_id) for r in ap_rows}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, recall
    # per-query output is still exactly top-k shaped
    from collections import Counter

    per_q = Counter(r.q_id for r in ap_rows)
    assert all(v <= 3 for v in per_q.values())


def test_ivf_topk_recall(spark, sf_dir):
    """IVF scale path: n_probe of n_cells bounds cost; recall vs brute
    force rises with n_probe and is near-total at n_probe = n_cells."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {(r.q_id, r.n_id) for r in ann.brute_force_topk(emb, queries, k=3).collect()}

    def recall(n_probe):
        got = ann.ivf_topk(
            emb, queries, k=3, n_cells=8, n_probe=n_probe, sample=512
        ).collect()
        return len(exact & {(r.q_id, r.n_id) for r in got}) / len(exact)

    r2 = recall(2)
    r8 = recall(8)
    assert r8 >= r2
    assert r8 >= 0.95, (r2, r8)  # probing every cell == exact modulo ties
    assert r2 >= 0.4, r2


def test_ivf_auto_scale_params_recall(spark):
    """Scale parameterization gate (VERDICT r3 #6): n_cells=None applies
    the sqrt(n) rule, training samples 64x cells, and recall@10 at
    n_probe=4 clears 0.9 on a clustered synthetic (the pytest-sized mirror
    of BENCH/ivf_recall.py's 10^6-vector curve)."""
    import numpy as np
    import pandas as pd

    n, dim, k = 20_000, 16, 10
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(50, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 50, n)] + 0.15 * rng.normal(size=(n, dim))
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    q_ids = np.arange(16) * (n // 16)
    sims = x[q_ids] @ x.T
    truth = {}
    for qi, qid in enumerate(q_ids):
        s = sims[qi].copy()
        s[qid] = -np.inf
        truth[int(qid)] = set(np.argpartition(-s, k)[:k].tolist())

    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64),
         "embedding": list(x.astype(np.float32))}
    )
    corpus = spark.createDataFrame(pdf)
    queries = corpus.where(F.col("vec_id").isin([int(i) for i in q_ids]))
    assert ann.ivf_n_cells_for(n) == round(n ** 0.5)
    got = ann.ivf_topk(
        corpus, queries, k=k, n_cells=None, n_probe=4, seed=5
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(int(r.q_id), set()).add(int(r.n_id))
    rec = sum(len(by_q.get(q, set()) & t) / k for q, t in truth.items()) / len(truth)
    assert rec >= 0.9, rec


def test_multimodal_plumbing(spark):
    media = multimodal.synth_media(spark, n=48)
    feats = multimodal.extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 48
    assert all(len(r.features) == multimodal.FEATURE_DIM for r in rows)
    # determinism: same payload -> same features
    again = {r.media_id: r.features for r in multimodal.extract_features(media, fake=True).collect()}
    first = {r.media_id: r.features for r in rows}
    assert first == again
    # vectorized batching observable: rows processed in multi-row batches
    assert max(r.batch_rows for r in rows) > 1
    # metadata ops are pure JVM
    rs = multimodal.resize_meta(media, 256).collect()
    assert all(max(r.target_width, r.target_height) <= 256 for r in rs)
    plan = multimodal.frame_sample_plan(media, every_n=10)
    vid = media.where(F.col("kind") == "video").count()
    assert plan.select("media_id").distinct().count() == vid


def test_multimodal_real_decode(spark):
    """Real decode path: netpbm images and PCM WAVs produce real features
    (grid-mean / windowed RMS) matching a local recomputation; video (no
    stdlib codec) yields null features."""
    media = multimodal.synth_media(spark, n=24)
    feats = {r.media_id: r for r in multimodal.extract_features(media).collect()}
    payloads = {r.media_id: (bytes(r.payload), r.kind) for r in media.collect()}
    n_real = 0
    for mid, (payload, kind) in payloads.items():
        got = feats[mid].features
        expect = multimodal.decode_features(payload, kind)
        if kind == "video":
            assert got is None
            continue
        assert expect is not None and got is not None, (mid, kind)
        assert np.allclose(got, expect, atol=1e-6), mid
        n_real += 1
    assert n_real == 16  # 8 images + 8 audios of 24 round-robin rows


def test_multimodal_png_decode(spark):
    """Compressed-codec tier (VERDICT r4 #5): non-interlaced 8-bit PNG
    decodes through the REAL path against known pixel truth — every PNG
    filter type (0-4), grayscale and RGB — and malformed/unsupported
    payloads fall through to null features, not exceptions."""
    rng = np.random.default_rng(77)
    rows, truths = [], {}
    mid = 0
    for nch in (1, 3):
        for fts in ([0] * 10, [1] * 10, [2] * 10, [3] * 10, [4] * 10,
                    [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]):
            arr = rng.integers(0, 256, size=(10, 6, nch), dtype=np.uint8)
            png = multimodal.make_png(arr.squeeze(), filters=fts)
            luma = (arr[:, :, 0] if nch == 1 else arr.mean(axis=2)) / 255.0
            truths[mid] = multimodal._image_features(luma)
            rows.append((mid, "image", bytearray(png), (6, 10, 0, 0)))
            mid += 1
    # malformed: truncated PNG and a JPEG-looking payload -> null features
    rows.append((mid, "image", bytearray(rows[0][2][:30]), (6, 10, 0, 0)))
    rows.append((mid + 1, "image", bytearray(b"\xff\xd8\xff\xe0" + b"x" * 64), (0, 0, 0, 0)))
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = {r.media_id: r.features for r in multimodal.extract_features(media).collect()}
    for k, truth in truths.items():
        assert feats[k] is not None, k
        assert np.allclose(feats[k], truth, atol=1e-6), k
    assert feats[mid] is None and feats[mid + 1] is None


def test_multimodal_decoder_registry(spark):
    """register_decoder plugs a new codec into the SAME Spark plan: a toy
    'raw64' image format becomes decodable without touching
    extract_features; replacement by name and prepend ordering work."""
    def raw64(payload: bytes):
        if payload[:6] != b"RAW64:" or len(payload) != 6 + 64:
            return None
        return np.frombuffer(payload[6:], dtype=np.uint8).astype(np.float64).reshape(8, 8) / 255.0

    multimodal.register_decoder("image", "raw64", raw64)
    try:
        rng = np.random.default_rng(5)
        px = rng.integers(0, 256, size=64, dtype=np.uint8)
        payload = b"RAW64:" + px.tobytes()
        media = spark.createDataFrame(
            [(0, "image", bytearray(payload), (8, 8, 0, 0))], multimodal.MEDIA_SCHEMA
        )
        out = multimodal.extract_features(media).collect()[0]
        truth = multimodal._image_features(px.astype(np.float64).reshape(8, 8) / 255.0)
        assert out.features is not None and np.allclose(out.features, truth)
    finally:
        multimodal.DECODERS["image"] = [
            (n, f) for n, f in multimodal.DECODERS["image"] if n != "raw64"
        ]


def test_simhash_np_matches_sql(spark):
    rng = np.random.default_rng(21)
    rows = [
        (f"c{i}", [int(np.int64(v)) for v in rng.integers(0, 2**64, size=n, dtype=np.uint64)])
        for i, n in enumerate((1, 5, 64, 300))
    ]
    df = spark.createDataFrame(rows, "conv_id string, shingles array<long>")
    sql_out = {r.conv_id: r.simhash for r in simhash.simhash_signatures(df).collect()}
    np_out = {r.conv_id: r.simhash for r in simhash.simhash_signatures_np(df).collect()}
    assert sql_out == np_out


def test_shrivastava_signature_support_jaccard(spark):
    """ShrivastavaHash (mh.h:1009-1177): register-equality fraction of two
    sparse vectors' signatures estimates the Jaccard of their supports."""
    m = 1024
    a = list(range(0, 60))
    b = list(range(30, 90))  # |inter|=30, |union|=90
    true_j = 30 / 90
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, a), (4, [])],
        "vec_id long, nz array<int>",
    )
    got = {r.vec_id: r.shr_sig for r in ann.shrivastava_signature_np(df, m=m).collect()}
    assert got[1] == got[3]  # equal supports -> equal signatures
    assert got[4] is None
    frac = sum(1 for x, y in zip(got[1], got[2]) if x == y) / m
    sigma = (true_j * (1 - true_j) / m) ** 0.5
    assert abs(frac - true_j) <= 3 * sigma, (frac, true_j)
    assert set(got[1]) <= set(a)


def test_pcsa_estimate_and_or_merge(spark):
    """PCSA (pc.h): OR-monoid bitmap registers; merge == union; estimate
    within ~3 * 0.78/sqrt(m) of the truth."""
    rng = np.random.default_rng(41)
    n = 30_000
    a = [int(v) for v in np.unique(rng.integers(-(2**63), 2**63, size=n + 2000, dtype=np.int64))[:n]]
    rows = [("A", h) for h in a] + [("B", h) for h in a[: n // 2]] + [
        ("U", h) for h in a
    ]
    df = spark.createDataFrame(rows, "g string, h long")
    p = 8
    regs = {r.g: r.regs for r in hll.pcsa_registers(df, "g", "h", p).collect()}
    merged = [x | y for x, y in zip(regs["A"], regs["B"])]
    assert merged == list(regs["U"])  # B ⊂ A: union bitmap == A's
    est = (
        spark.createDataFrame([(regs["A"],)], "regs array<long>")
        .select(hll.pcsa_estimate_col(F.col("regs"), p).alias("e"))
        .collect()[0]
        .e
    )
    assert abs(est - n) / n < 3 * 0.78 / (1 << p) ** 0.5 + 0.05, est


def test_embedding_dup_pairs_planted(spark):
    """embedding_dup_pairs must emit exactly the brute-force cosine pairs
    >= tau on a planted corpus (exact precision by construction; recall via
    SRP banding — deterministic under the fixed seed)."""
    import numpy as np

    from sketch_spark.operators.ann import embedding_dup_pairs

    rng = np.random.default_rng(7)
    dim, tau = 16, 0.95
    base = rng.standard_normal((8, dim))
    rows = []
    for g in range(8):  # 3 near-identical copies per group
        for c in range(3):
            v = base[g] + 0.01 * rng.standard_normal(dim)
            rows.append((g * 3 + c, (v / np.linalg.norm(v)).tolist()))
    for i in range(16):  # unrelated noise
        v = rng.standard_normal(dim)
        rows.append((24 + i, (v / np.linalg.norm(v)).tolist()))
    mat = np.stack([np.asarray(v) for _, v in rows])
    cos = mat @ mat.T
    want = {
        (i, j): cos[i, j]
        for i in range(len(rows))
        for j in range(i + 1, len(rows))
        if cos[i, j] >= tau
    }
    assert len(want) == 8 * 3  # sanity: the 8 planted triangles only

    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.a, r.b): r.cos
        for r in embedding_dup_pairs(
            df, tau=tau, dim=dim, n_bits=32, band_bits=8, bucket_cap=16
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_pccm_quantize_decode_bounds(spark):
    """c(n) = floor(log2 n) + 1 exactly (integer digit count, no float log);
    decode 2^(c-1) is the largest power of two <= n; saturation at the
    BITS-bit cell max (update.h:39 'Also saturates')."""
    from pyspark.sql import functions as F

    ns = [1, 2, 3, 4, 7, 8, 9, 255, 256, 1023, 1 << 40, (1 << 40) + 17, 0]
    df = spark.createDataFrame([(n,) for n in ns], "n long")
    got = {
        r.n: (r.c, r.est)
        for r in df.select(
            "n",
            frequency.pccm_quantize_col(F.col("n"), bits=8).alias("c"),
            frequency.pccm_est_col(
                frequency.pccm_quantize_col(F.col("n"), bits=8)
            ).alias("est"),
        ).collect()
    }
    for n in ns:
        c, est = got[n]
        if n == 0:
            assert (c, est) == (0, 0)
        else:
            assert c == n.bit_length()
            assert est == 1 << (n.bit_length() - 1)
            assert est <= n < 2 * est
    # saturation: with 3-bit cells max c = 7
    sat = df.select(
        frequency.pccm_quantize_col(F.col("n"), bits=3).alias("c")
    ).agg(F.max("c")).collect()[0][0]
    assert sat == 7


def test_pccm_merge_combine_rule(spark):
    """Cell-wise merge must follow update.h:73-78 literally:
    max(i, j) + (i == j); one-sided cells pass through; saturating."""
    from pyspark.sql import functions as F

    a_cells = [(0, 1, 3), (0, 2, 5), (1, 4, 7)]
    b_cells = [(0, 1, 3), (0, 2, 2), (1, 9, 4)]
    a = spark.createDataFrame(a_cells, "seed int, bucket int, c long")
    b = spark.createDataFrame(b_cells, "seed int, bucket int, c long")
    m = {
        (r.seed, r.bucket): r.c
        for r in frequency.pccm_merge(a, b, bits=3).collect()
    }
    assert m[(0, 1)] == 4  # equal cells: 3 + 1
    assert m[(0, 2)] == 5  # max(5, 2)
    assert m[(1, 4)] == 7  # a only, already at 3-bit max
    assert m[(1, 9)] == 4  # b only
    # saturation: two equal max cells stay at the cell max
    s1 = spark.createDataFrame([(0, 0, 7)], "seed int, bucket int, c long")
    sat = frequency.pccm_merge(s1, s1, bits=3).collect()[0].c
    assert sat == 7


def test_pccm_query_collision_free_exact(spark):
    """With w large enough for zero collisions the estimate is EXACTLY
    est_count(c(true)) — deterministic, unlike the reference's RNG
    counters whose expectation this encoding matches."""
    rows = [(k,) for k in range(16) for _ in range((k + 1) * 9)]
    df = spark.createDataFrame(rows, "key int")
    pc = frequency.pccm_sketch(df, "key", d=4, w=1 << 14, bits=8)
    keys = spark.createDataFrame([(k,) for k in range(16)], "key int")
    est = {
        r.key: r.est_count
        for r in frequency.pccm_query(pc, keys, "key", d=4, w=1 << 14).collect()
    }
    for k in range(16):
        true = (k + 1) * 9
        assert est[k] == 1 << (true.bit_length() - 1)
        assert est[k] <= true < 2 * est[k]


def test_hyperbitbit_fold_semantics():
    """hbb.h:28-38 parity: inserts below the logn threshold are ignored;
    the 32nd distinct s1 bit promotes (s1 <- s2, s2 <- 0, logn += 1);
    estimate = 2^(logn + 5.8 + popcount(s1)/32) (hbb.h:40-43)."""
    # hv with ctz = r and top-6 = k: hv = (k << 58) | (1 << r)
    def mk(r, k):
        return (k << 58) | (1 << r)

    # r <= logn=5: ignored entirely
    assert hll.hyperbitbit_fold([mk(5, 7), mk(3, 1)]) == (5, 0, 0)
    # r = 6 sets s1 only; r = 7 sets s1 and s2
    assert hll.hyperbitbit_fold([mk(6, 3)]) == (5, 1 << 3, 0)
    assert hll.hyperbitbit_fold([mk(7, 3)]) == (5, 1 << 3, 1 << 3)
    # 32 distinct k at r=6 (s2 stays 0) -> promotion to (6, 0, 0)
    seq = [mk(6, k) for k in range(32)]
    assert hll.hyperbitbit_fold(seq) == (6, 0, 0)
    # 31 bits at r=6 plus one at r=7: promotion carries the r=7 bit
    seq = [mk(6, k) for k in range(31)] + [mk(7, 31)]
    assert hll.hyperbitbit_fold(seq) == (6, 1 << 31, 0)
    # estimate formula
    assert hll.hyperbitbit_estimate(5, 0) == 2.0 ** (5 + 5.8)
    assert hll.hyperbitbit_estimate(6, (1 << 16) - 1) == 2.0 ** (6 + 5.8 + 0.5)


def test_hyperbitbit_accuracy_band():
    """Planted cardinalities under WangHash: the single-word estimator's
    documented crudeness, bounded to a 2.5x band (the reference ships no
    tighter test for hbb)."""
    from sketch_spark.functions.hashing import wanghash_np

    for n in (10_000, 100_000, 1_000_000):
        hs = wanghash_np(np.arange(1, n + 1, dtype=np.uint64))
        logn, s1, _ = hll.hyperbitbit_fold(int(h) for h in hs)
        est = hll.hyperbitbit_estimate(logn, s1)
        assert n / 2.5 <= est <= n * 2.5, (n, est)


def test_hyperbitbit_groups_matches_fold_and_is_partition_invariant(spark):
    """The Spark group form folds in the NAMED order (ord asc, hash tie),
    so it must equal the driver-side fold on the same sorted rows and be
    byte-identical across repartitionings."""
    from sketch_spark.functions.hashing import wanghash_np

    rng = np.random.default_rng(23)
    rows = []
    truth = {}
    for g in ("a", "b", "c"):
        n = int(rng.integers(200, 2000))
        hs = wanghash_np(rng.integers(1, 1 << 62, size=n, dtype=np.uint64))
        order = np.arange(n)
        rng.shuffle(order)
        srt = sorted(zip(order.tolist(), (int(h) for h in hs)))
        logn, s1, s2 = hll.hyperbitbit_fold(h for _, h in srt)
        def i64(x):
            return x - (1 << 64) if x >= (1 << 63) else x
        truth[g] = (logn, i64(s1), i64(s2))
        rows += [(g, i64(int(h)), int(o)) for h, o in zip(hs, order.tolist())]
    df = spark.createDataFrame(rows, "g string, h long, ord long")
    for parts in (1, 7):
        got = {
            r.g: (r.logn, r.s1, r.s2)
            for r in hll.hyperbitbit_groups(
                df.repartition(parts), "g", "h", "ord"
            ).collect()
        }
        assert got == truth, parts


def test_hyperhyperbitbit_matches_literal_twin(spark):
    """hyperhyperbitbit_groups == a literal python twin of hbb.h:78-134
    (shard by u mod n, fold u // n per shard with the HHBB bit rule,
    report via the ies harmonic form), partition-invariant under the
    defined order; estimate lands in a sane band on 200k distinct."""
    import numpy as np

    from sketch_spark.operators import hll
    from sketch_spark.functions.hashing import wanghash_np

    rng = np.random.default_rng(99)
    n = 64
    rows, truth = [], {}
    for g, sz in (("a", 5_000), ("b", 200_000)):
        hs = wanghash_np(rng.integers(1, 1 << 62, size=sz, dtype=np.uint64))
        # literal twin: shard, per-shard ordered fold (order = ascending
        # hash, the operator's default), report()
        shards: dict[int, list[int]] = {}
        for h in sorted(int(x) for x in hs):
            shards.setdefault(h % n, []).append(h // n)
        tot = 0.0
        for i in range(n):
            logn, s1, _ = hll.hyperhyperbitbit_fold(shards.get(i, []))
            tot += 2.0 ** -(bin(s1).count("1") / 32.0 + 6.43 + logn)
        truth[g] = n * n / tot

        def i64(x):
            return x - (1 << 64) if x >= (1 << 63) else x

        rows += [(g, i64(int(h))) for h in hs]

    df = spark.createDataFrame(rows, "g string, h long")
    for parts in (1, 7):
        got = {
            r.g: r.est
            for r in hll.hyperhyperbitbit_groups(
                df.repartition(parts), "g", "h", n=n
            ).collect()
        }
        for g in truth:
            assert abs(got[g] - truth[g]) / truth[g] < 1e-9, (g, parts)
    # loose accuracy band (the reference publishes no tolerance for the
    # 6.43-constant ies estimator; this pins gross sanity, not calibration)
    assert 0.3 < got["b"] / 200_000 < 3.0


def test_hyperbitbit_groups_null_hashes_keep_int64_precision(spark):
    """A null hash in a group's Arrow batch must not corrupt the others:
    pyarrow lifts an int64 column WITH nulls to float64 in pandas, rounding
    every hash >= 2^53 before the fold reads its low (ctz) bits.  The nulls
    are therefore dropped Spark-side; the group result must equal the fold
    over the non-null hashes exactly.  (Round-4 review finding: the earlier
    pandas-side dropna ran after the precision was already gone.)"""
    # odd low bits on >2^62 values: float64 rounds these to even multiples
    # of 512, flipping ctz from 0 to >=9 — exactly what the fold reads
    hs = [(1 << 62) + 1, (1 << 62) + 3, (1 << 62) + 12345, 7]
    rows = [("a", h) for h in hs] + [("a", None), ("b", None), ("b", 5)]
    df = spark.createDataFrame(rows, "g string, h long")
    got = {
        r.g: (r.logn, r.s1, r.s2)
        for r in hll.hyperbitbit_groups(df, "g", "h").collect()
    }
    assert got["a"] == hll.hyperbitbit_fold(sorted(hs))
    assert got["b"] == hll.hyperbitbit_fold([5])


def test_hyperhyperbitbit_groups_null_hashes_keep_int64_precision(spark):
    """Same mechanism for the sharded form: a null in any (group, shard)
    batch must not round the shard's quotient stream."""
    n = 4
    hs = [(1 << 62) + 1, (1 << 62) + 3, (1 << 62) + 12345, 7, 901]
    rows = [("a", h) for h in hs] + [("a", None)]
    clean = spark.createDataFrame([("a", h) for h in hs], "g string, h long")
    dirty = spark.createDataFrame(rows, "g string, h long")
    est_clean = hll.hyperhyperbitbit_groups(clean, "g", "h", n=n).collect()[0].est
    est_dirty = hll.hyperhyperbitbit_groups(dirty, "g", "h", n=n).collect()[0].est
    assert est_clean == est_dirty
    # and the clean value matches the literal twin
    shards: dict[int, list[int]] = {}
    for h in sorted(hs):
        shards.setdefault(h % n, []).append(h // n)
    tot = 0.0
    for i in range(n):
        logn, s1, _ = hll.hyperhyperbitbit_fold(shards.get(i, []))
        tot += 2.0 ** -(bin(s1).count("1") / 32.0 + 6.43 + logn)
    assert abs(est_clean - n * n / tot) / (n * n / tot) < 1e-12


def test_ivf_assign_clamps_n_probe_and_empty_corpus_raises(spark):
    """n_probe beyond the trained cell count must clamp (argsort yields
    only k columns; unclamped the output frame constructor threw), and an
    empty corpus must fail loudly, not with a numpy AxisError."""
    import numpy as np

    from sketch_spark.operators import ann

    rng = np.random.default_rng(3)
    rows = [
        (i, rng.standard_normal(8).tolist()) for i in range(3)
    ]  # 3 vectors -> at most 3 centroids
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ann.train_ivf_centroids(df, vec_col="embedding", n_cells=16)
    assert cents.shape[0] <= 3
    out = ann.ivf_assign(df, cents, vec_col="embedding", n_probe=8).collect()
    # every vector got min(8, k) probes
    assert len(out) == 3 * cents.shape[0]
    with pytest.raises(Exception, match="empty corpus"):
        ann.train_ivf_centroids(
            df.where("vec_id < 0"), vec_col="embedding", n_cells=4
        )


def test_ivf_training_sample_is_byte_bounded(spark, monkeypatch):
    """VERDICT r5 #3: at high dims the auto training sample must be capped
    by rows*dim*8 <= SPARK_GRAFT_IVF_TRAIN_BYTES, not by a row count tuned
    for dim 64.  dim 1024, n_cells=65536: the uncapped rule asks for
    64*65536 rows (~34 GB); a 100-row byte budget must cut the collect to
    100 rows (observable as the trained cell count, k = min(cells, rows))."""
    import numpy as np

    from sketch_spark.operators import ann

    dim = 1024
    budget_rows = 300  # above the 256-row trainability floor (~2 MB at dim 1024)
    monkeypatch.setenv("SPARK_GRAFT_IVF_TRAIN_BYTES", str(budget_rows * dim * 8))
    rng = np.random.default_rng(11)
    rows = [(i, rng.standard_normal(dim).tolist()) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ann.train_ivf_centroids(df, vec_col="embedding", n_cells=65536)
    assert cents.shape == (budget_rows, dim)


def test_srp_and_ivf_preserve_string_ids(spark):
    import numpy as np

    from sketch_spark.operators import ann

    rng = np.random.default_rng(4)
    rows = [(f"v{i}", rng.standard_normal(8).tolist()) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    sig = ann.srp_signatures(df, vec_col="embedding", n_bits=16, dim=8)
    assert dict(sig.dtypes)["vec_id"] == "string"
    assert sig.count() == 6
    cents = ann.train_ivf_centroids(df, vec_col="embedding", n_cells=2)
    asg = ann.ivf_assign(df, cents, vec_col="embedding", n_probe=1)
    assert dict(asg.dtypes)["n_id"] == "string"
    assert asg.count() == 6


def test_bloom_build_partial_last_word_no_false_negatives(spark):
    """n_bits not divisible by 64: the last PARTIAL word must materialize
    (a floor-div dropped it, and keys hashing into the tail probed null —
    a false negative)."""
    from sketch_spark.operators import membership as MB

    keys = list(range(1, 301))
    elems = spark.createDataFrame([(k,) for k in keys], "k long")
    bits = MB.bloom_build(elems, "k", n_bits=1000, n_hashes=5)
    row = bits.collect()[0]
    assert len(row.bits) == 16  # ceil(1000/64)
    probes = spark.createDataFrame([(k,) for k in keys], "k long")
    got = MB.bloom_probe(probes, bits, "k", n_bits=1000, n_hashes=5)
    n_true = got.where("may_contain").count()
    assert n_true == len(keys)  # zero false negatives


def test_simhash_np_null_array_matches_expr_path(spark):
    """NULL and empty shingle arrays map to 0 on BOTH paths — the expr
    path's IF(null-votes >= 0, ...) takes the else branch for nulls, and
    the np path mirrors it; this pins the interchangeability contract so
    neither variant drifts (callers must filter null/empty shingle docs
    before treating hamming-0 as duplicate evidence)."""
    from sketch_spark.operators import simhash as SH

    df = spark.createDataFrame(
        [("a", [1, 2, 3]), ("b", None), ("c", [])],
        "conv_id string, shingles array<long>",
    )
    via_np = {
        r.conv_id: r.simhash
        for r in SH.simhash_signatures_np(df, "shingles", "conv_id").collect()
    }
    via_expr = {
        r.conv_id: r.simhash
        for r in SH.simhash_signatures(df, "shingles").select(
            "conv_id", "simhash"
        ).collect()
    }
    assert via_np == via_expr
    assert via_np["b"] == 0 and via_np["c"] == 0


def test_lpcqf_disjoint_inner_product_is_zero(spark):
    from sketch_spark.operators.frequency import lpcqf_inner_product, lpcqf_sketch

    a = lpcqf_sketch(
        spark.createDataFrame([(1,), (2,)], "k long"), "k", nregs=64
    )
    b = lpcqf_sketch(
        spark.createDataFrame([(1001,), (1002,)], "k long"), "k", nregs=64
    )
    # force disjoint cells by filtering b to buckets a doesn't have
    b_only = b.join(a.select("bucket", "sig"), ["bucket", "sig"], "left_anti")
    row = lpcqf_inner_product(a, b_only).collect()[0]
    assert row.inner_product == 0


def test_conv_table_null_turn_text_is_not_dropped(spark):
    """array_join skips null elements by default, which made a conversation
    with a null-text turn serialize identically to one WITHOUT that turn —
    a false exact duplicate.  The empty-string replacement keeps the
    separator slot, so the two stay distinct."""
    from sketch_spark.operators import transcripts as TR

    rows = [
        ("A", 0, "u", "x", None, None),
        ("A", 1, "a", None, None, None),
        ("A", 2, "u", "y", None, None),
        ("B", 0, "u", "x", None, None),
        ("B", 1, "u", "y", None, None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    conv = {r.conv_id: r for r in TR.conv_table(t).collect()}
    assert conv["A"].full_text == "x\x1e\x1ey"
    assert conv["B"].full_text == "x\x1ey"
    assert conv["A"].full_hash != conv["B"].full_hash


def test_multimodal_degenerate_payloads(spark):
    """Zero-width netpbm payloads must decode to null features (np.pad on
    an empty axis crashed the task before); zero-frame videos schedule no
    frames; extreme aspect ratios never round a resize side to 0."""
    import numpy as np

    from sketch_spark.operators import multimodal as MM

    assert MM._decode_netpbm(b"P5\n0 5 255\n") is None
    assert MM._decode_netpbm(b"P5\n5 0 255\n") is None

    rows = [
        ("m1", "video", (1, 4096, 0), None),
        ("m2", "video", (640, 480, 25), None),
        ("m3", "image", (1, 4096, None), None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id string, kind string, "
        "meta struct<width:int,height:int,n_frames:int>, payload binary",
    )
    frames = MM.frame_sample_plan(media, every_n=10).collect()
    ids = {r.media_id for r in frames}
    assert "m1" not in ids and "m2" in ids
    rs = {r.media_id: r for r in MM.resize_meta(media, max_side=256).collect()}
    assert rs["m3"].target_width >= 1 and rs["m3"].target_height == 256
