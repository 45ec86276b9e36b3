"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``realtime_voting_system_spark`` (see SURVEY.md §2
for the operator inventory each entry covers). Full-registry verification
beyond the driver's sample is done in-repo by ``tools/selfcheck.py``,
which sweeps every registered query against its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from realtime_voting_system_spark.plans import parity
from realtime_voting_system_spark.session import tune


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.1 minimum slice): Q2-shape ranked share
    with pct-of-total + latest-bucket lag on /root/testdata/sf0.001."""
    tune(spark)
    return parity.QUERIES["q2_ranked_share"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in natural
    registration order."""
    return dict(parity.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each queries() entry. Keys missing
    here (non-SQL-expressible ops) get the driver's rows-only check."""
    return dict(parity.ORACLE_SQL)
