"""Smoke: the driver contract works end to end at sf0.001."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"user_id", "contributions"}
    # descending contributions
    contribs = [r["contributions"] for r in rows]
    assert contribs == sorted(contribs, reverse=True)


def test_queries_registered(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_all_queries_execute_small(spark, sf_small):
    """Every registered query must at least build a plan and return a schema."""
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_small)
        assert df.schema is not None, name
