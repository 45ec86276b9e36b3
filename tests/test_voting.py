"""Voting-schema parity: every reference query (Q1-Q8, G1) on generated
candidate/voter/vote data vs its DuckDB oracle — the §5.1 differential
corpus on the actual star schema, plus the reference's own statistical
oracle (§5: observed shares ≈ configured weights)."""

from __future__ import annotations

import duckdb
import pytest

from realtime_voting_system_spark.catalog import verify_schema
from realtime_voting_system_spark.plans.voting import (
    VOTING_ORACLE_SQL,
    VOTING_QUERIES,
)
from realtime_voting_system_spark.sources import generator

from .oracle import assert_frames_match

N_VOTERS = 4000


@pytest.fixture(scope="module")
def star(spark, tmp_path_factory):
    """Generated star written to parquet so Spark and DuckDB read the SAME
    bytes (not two in-memory copies)."""
    base = tmp_path_factory.mktemp("voting")
    tables = generator.generate_star(spark, n_voters=N_VOTERS, seed=7)
    out = {}
    for name, df in tables.items():
        path = str(base / f"{name}.parquet")
        df.coalesce(4).write.mode("overwrite").parquet(path)
        out[name] = spark.read.parquet(path)
    return base, out


def _duck(base, sql: str):
    con = duckdb.connect()
    for t in ("candidate", "voter", "vote"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{base}/{t}.parquet/*.parquet'"
        )
    return con.sql(sql).df()


def test_schemas_match_declaration(star):
    _, t = star
    for name, df in t.items():
        assert verify_schema(df, name) == []


@pytest.mark.parametrize("name", sorted(VOTING_QUERIES))
def test_voting_query_matches_oracle(star, name):
    base, t = star
    actual = VOTING_QUERIES[name](t).toPandas()
    expected = _duck(base, VOTING_ORACLE_SQL[name])
    assert_frames_match(actual, expected, name)


def test_weighted_shares_converge(star):
    """The reference's implicit statistical oracle (SURVEY §5): generated
    candidate shares match the 22/40/35 weights (+3pt last-candidate
    fallback, data_generator.py:180-181) within sampling noise."""
    _, t = star
    counts = {
        r["candidate_id"]: r["count"]
        for r in t["vote"].groupBy("candidate_id").count().collect()
    }
    total = sum(counts.values())
    expected = {"cand-000": 0.22, "cand-001": 0.40, "cand-002": 0.35 + 0.03}
    for cid, want in expected.items():
        got = counts.get(cid, 0) / total
        assert abs(got - want) < 0.03, f"{cid}: share {got:.3f} vs {want}"


def test_one_vote_per_voter(star):
    _, t = star
    votes = t["vote"]
    assert votes.count() == N_VOTERS
    assert votes.select("voter_id").distinct().count() == N_VOTERS
