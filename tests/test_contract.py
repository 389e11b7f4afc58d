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
    # every query has a value oracle (q23 gained a register-exact one)
    q = E.queries()
    o = E.oracle_sql()
    rows_only = set(q) - set(o)
    assert rows_only == set()
