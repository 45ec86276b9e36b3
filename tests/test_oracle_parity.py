"""Differential tests: every driver-contract query vs its DuckDB oracle at
sf0.001 (the driver runs the same compare at sf0.01 — SURVEY.md §5 item 1).

Two tiers (driver-verify time budget, VERIFY_r11): the default run checks a
deterministic ~1/6 sample of the registry (every query still runs under the
full tier and the three-scale tools/selfcheck artifact); ``-m ""`` runs all.
"""

from __future__ import annotations

import hashlib

import pytest

from realtime_voting_system_spark.plans import parity

from .oracle import check_query


def _oracle_cases():
    return sorted(parity.ORACLE_SQL)


def _fast(name: str) -> bool:
    """Deterministic registry sample for the default tier."""
    return int(hashlib.md5(name.encode()).hexdigest()[:8], 16) % 6 == 0


@pytest.mark.parametrize(
    "name", [n for n in _oracle_cases() if _fast(n)]
)
def test_query_matches_oracle(spark, sf_dir, name):
    check_query(spark, name, sf_dir)


@pytest.mark.slow
@pytest.mark.parametrize(
    "name", [n for n in _oracle_cases() if not _fast(n)]
)
def test_query_matches_oracle_full(spark, sf_dir, name):
    check_query(spark, name, sf_dir)


@pytest.mark.slow
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
