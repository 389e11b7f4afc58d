"""setsim: the two exact overlap-join strategies must agree with each other
and with a brute-force all-pairs intersect on a planted corpus."""

import itertools

import pytest
from pyspark.sql import functions as F  # noqa: F401

from sketch_spark.operators.setsim import overlap_count_join, overlap_join

ROWS = [
    # (id, block, elements) — crafted so blocks, sizes, and overlaps vary:
    # ids 1/2 share 4 of 6; 3 shares 2 with 1; 4 is in another block with a
    # high overlap to 5; 6 is too small to qualify anywhere at t=3.
    (1, "x", [10, 11, 12, 13, 14, 15]),
    (2, "x", [12, 13, 14, 15, 16, 17]),
    (3, "x", [10, 11, 20, 21, 22, 23]),
    (4, "y", [10, 11, 12, 13, 14, 15]),
    (5, "y", [10, 11, 12, 13, 30, 31]),
    (6, "y", [10, 11]),
    (7, "x", [13, 14, 15, 16, 24, 25]),
]


def _brute(t):
    out = {}
    for (ia, ba, ea), (ib, bb, eb) in itertools.combinations(ROWS, 2):
        if ba != bb:
            continue
        inter = len(set(ea) & set(eb))
        if inter >= t:
            a, b = sorted((ia, ib))
            out[(a, b)] = (inter, len(ea) if a == ia else len(eb),
                           len(eb) if a == ia else len(ea))
    return out


@pytest.mark.parametrize("t", [2, 3, 4])
def test_count_join_matches_brute_force(spark, t):
    df = spark.createDataFrame(ROWS, "id long, blk string, es array<long>")
    got = {
        (r.a, r.b): (r.n_inter, r.n_a, r.n_b)
        for r in overlap_count_join(df, "id", "es", t, ("blk",)).collect()
    }
    assert got == _brute(t)


@pytest.mark.parametrize("t", [2, 4])
def test_prefix_join_matches_count_join(spark, t):
    df = spark.createDataFrame(ROWS, "id long, blk string, es array<long>")
    a = {
        (r.a, r.b): (r.n_inter, r.n_a, r.n_b)
        for r in overlap_join(df, "id", "es", t, ("blk",)).collect()
    }
    b = {
        (r.a, r.b): (r.n_inter, r.n_a, r.n_b)
        for r in overlap_count_join(df, "id", "es", t, ("blk",)).collect()
    }
    assert a == b == _brute(t)


def test_no_block_cols(spark):
    df = spark.createDataFrame(ROWS, "id long, blk string, es array<long>")
    got = {
        (r.a, r.b): r.n_inter
        for r in overlap_count_join(df, "id", "es", 4).collect()
    }
    # cross-block pairs now qualify too: 1-4 (6 shared), 1-5/4-5 (4 shared)
    assert got[(1, 4)] == 6 and got[(1, 5)] == 4 and got[(4, 5)] == 4
    assert (1, 2) in got and (2, 7) in got
