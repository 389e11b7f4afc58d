"""Replays the driver's correctness gate locally: every queries() entry must
match its oracle_sql() on DuckDB (row count + schema + values)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from tests.oracle_compare import compare, duck_connect  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {"doc_id", "cluster_id"}


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_query_vs_oracle(spark, duck, name):
    fn = E.queries()[name]
    sql = E.oracle_sql().get(name)
    if sql is None:
        df = fn(spark, SF)
        assert df.count() >= 0
        return
    ok, msg = compare(fn(spark, SF), duck.execute(sql).df())
    assert ok, f"{name}: {msg}"
