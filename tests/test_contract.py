"""Driver-contract consistency checks (no Spark needed)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E


def test_every_oracle_key_has_a_query():
    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q), set(o) - set(q)


def test_queries_are_callables_with_names():
    q = E.queries()
    assert len(q) >= 20
    for name, fn in q.items():
        assert callable(fn), name
        assert name.startswith("q"), name


def test_rows_only_queries_documented():
    # q23 is approximate by design -> intentionally no oracle
    q = E.queries()
    o = E.oracle_sql()
    rows_only = set(q) - set(o)
    assert rows_only == {"q23_hll_distinct_users"}
