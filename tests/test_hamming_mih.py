"""Exact multi-index Hamming join (simhash.hamming_pairs_exact).

Exactness: output == brute force on a corpus with planted pairs at and
around the radius boundary.  Plan gate (VERDICT r3 #5 / next-round #5):
the split-enumeration candidate set must stay far below both the all-pairs
count and the old 13-chunk pigeonhole form on a uniform synthetic corpus —
the 13-chunk form is recovered exactly as the n_chunks=13 (e=0) special
case of the same operator, so the comparison is apples-to-apples.
"""

import random

import pytest
from pyspark.sql import functions as F

from sketch_spark.operators.simhash import (
    hamming_pairs_exact,
    mih_candidate_hash_pairs,
)

BITS = 60
R = 12


def _flip(h: int, k: int, rng: random.Random) -> int:
    for b in rng.sample(range(BITS), k):
        h ^= 1 << b
    return h


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(1234)
    rows = []
    i = 0

    def add(h, blk):
        nonlocal i
        rows.append((f"d{i:05d}", blk, h))
        i += 1

    # background: uniform random hashes in two blocks
    for _ in range(260):
        add(rng.getrandbits(BITS), rng.choice(["s1", "s2"]))
    # planted: clusters at distances straddling the radius (0, 1, 6, 11,
    # 12 = boundary-in, 13 = boundary-out), some cross-block (must NOT pair)
    for d in (0, 1, 6, 11, 12, 13):
        base = rng.getrandbits(BITS)
        add(base, "s1")
        add(_flip(base, d, rng), "s1")
        add(_flip(base, d, rng), "s2")  # cross-block: never paired with s1
    # a 4-member same-hash group (distance-0 clique)
    h = rng.getrandbits(BITS)
    for _ in range(4):
        add(h, "s1")
    return rows


def _brute(rows):
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a[1] != b[1]:
                continue
            d = bin(a[2] ^ b[2]).count("1")
            if d <= R:
                x, y = sorted((a[0], b[0]))
                out.add((x, y, d))
    return out


def test_matches_brute_force(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id string, source string, simhash long")
    got = {
        (r.a, r.b, r.hamming)
        for r in hamming_pairs_exact(
            df, "doc_id", "simhash", bits=BITS, max_hamming=R,
            block_cols=("source",),
        ).collect()
    }
    assert got == _brute(corpus)


def test_matches_brute_force_single_block_various_chunks(spark, corpus):
    rows = [(d, "all", h) for d, _, h in corpus]
    df = spark.createDataFrame(rows, "doc_id string, source string, simhash long")
    want = _brute(rows)
    for q in (4, 5, 7, 13):
        got = {
            (r.a, r.b, r.hamming)
            for r in hamming_pairs_exact(
                df, "doc_id", "simhash", bits=BITS, max_hamming=R,
                n_chunks=q, block_cols=("source",),
            ).collect()
        }
        assert got == want, f"n_chunks={q}"


def test_candidate_volume_beats_13_chunk_pigeonhole(spark):
    """Uniform 60-bit hashes, one source: the e<=2 split-enumeration index
    (q=5, 12-bit keys) must produce several times fewer candidate hash
    pairs than the old 13-chunk e=0 pigeonhole (~4.6-bit keys), and stay
    well under all-pairs.  Expected analytically: ~q*C(w,<=e)/2^w = 9.6%
    of all-pairs vs ~54% for the 13-chunk form."""
    rng = random.Random(7)
    n = 2000
    dh = spark.createDataFrame(
        [(rng.getrandbits(BITS),) for _ in range(n)], "_h long"
    ).distinct()
    new = mih_candidate_hash_pairs(dh, BITS, R, n_chunks=5).count()
    old = mih_candidate_hash_pairs(dh, BITS, R, n_chunks=13).count()
    all_pairs = n * (n - 1) / 2
    assert new < all_pairs * 0.13, (new, all_pairs)
    assert old > all_pairs * 0.40, (old, all_pairs)  # the problem we replaced
    assert new * 4 < old, (new, old)
