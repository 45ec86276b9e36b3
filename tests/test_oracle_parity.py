"""Differential tests: every driver-contract query vs its DuckDB oracle at
sf0.001 (the driver runs the same compare at sf0.01 — SURVEY.md §5 item 1)."""

from __future__ import annotations

import pytest

from realtime_voting_system_spark.plans import parity

from .oracle import check_query


def _oracle_cases():
    return sorted(parity.ORACLE_SQL)


@pytest.mark.parametrize("name", _oracle_cases())
def test_query_matches_oracle(spark, sf_dir, name):
    check_query(spark, name, sf_dir)


def test_all_queries_run(spark, sf_dir):
    """Entries without an oracle still must run and return a stable schema."""
    for name, fn in parity.QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
