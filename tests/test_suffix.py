"""Winnowing substring pass: guarantee + exact verification."""

import numpy as np
import pytest

from sketch_spark.operators import suffix


def test_rolling_hash_matches_naive():
    s = "abcdefghabcdefgh" * 4
    k = 5
    h = suffix._kgram_hashes(s, k)
    for i in [0, 1, 7, len(s) - k]:
        v = np.uint64(0)
        with np.errstate(over="ignore"):
            for c in s[i : i + k]:
                v = v * suffix._B + np.uint64(ord(c))
        assert h[i] == v
    # identical k-grams collide
    assert h[0] == h[8]


def test_substring_pairs_detects_long_span(spark):
    span = "S" + " shared token stream " * 15  # ~300 chars
    rng = np.random.default_rng(5)

    def noise(n):
        return " ".join(f"w{rng.integers(0, 999):03d}" for _ in range(n))

    rows = [
        ("p1", noise(40) + span + noise(40)),
        ("p2", noise(60) + span + noise(10)),
        ("q1", noise(120)),
        ("q2", noise(120)),
    ]
    conv = spark.createDataFrame(rows, "conv_id string, full_text string")
    pairs = suffix.substring_pairs(conv, L=200, k=50)
    got = {(r.a, r.b) for r in pairs.collect()}
    assert ("p1", "p2") in got or ("p2", "p1") in got
    assert not any({a, b} <= {"q1", "q2"} for a, b in got)


def test_substring_pairs_non_ascii_alignment(spark):
    """Fingerprint positions are CHARACTER offsets; multi-byte text before
    the shared span must not misalign the verify windows (positions were
    byte offsets into UTF-8 before this test's bug class was fixed)."""
    span = "τhe shared ünïcode span — " * 12  # ~300 chars, multi-byte
    rng = np.random.default_rng(9)

    def noise(n, salt):
        return " ".join(f"ωord{salt}{rng.integers(0, 999):03d}" for _ in range(n))

    rows = [
        ("u1", noise(40, "α") + span + noise(40, "β")),
        ("u2", noise(60, "γ") + span + noise(10, "δ")),
        ("u3", noise(120, "ε")),
    ]
    conv = spark.createDataFrame(rows, "conv_id string, full_text string")
    pairs = suffix.substring_pairs(conv, L=200, k=50)
    got = {(r.a, r.b) for r in pairs.collect()}
    assert ("u1", "u2") in got
    assert not any("u3" in p for p in got)


def test_substring_pairs_span_threshold(spark):
    # shared span below L must NOT pair
    span = "only eighty characters of shared content here padding pad pad!!"[:80]
    rows = [
        ("a", "A" * 300 + span + "B" * 300),
        ("b", "C" * 300 + span + "D" * 300),
    ]
    conv = spark.createDataFrame(rows, "conv_id string, full_text string")
    pairs = suffix.substring_pairs(conv, L=200, k=50)
    assert pairs.count() == 0
