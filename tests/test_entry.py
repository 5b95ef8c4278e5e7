"""Driver-contract smoke tests: entry() shape, registry/oracle key parity."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def test_queries_and_oracles_align():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 28
    # every oracle references only registered tables
    for sql in o.values():
        assert "read_parquet" not in sql


def test_entry_runs_flagship(spark):
    df = entry_mod.entry(spark)
    assert df.columns == ["order_date", "product", "total_amount"]
    assert df.count() > 0
