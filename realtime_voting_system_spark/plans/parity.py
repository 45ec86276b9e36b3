"""Driver-contract queries: each reference query shape (SURVEY.md §2)
instantiated on the driver testdata (FIXTURES.md §B mapping), with a DuckDB
oracle SQL twin for the t2 hash-match gate.

Conventions (driver compares row-count + schema + order-insensitive
value-hash, columns sorted by name):
- every computed column is aliased identically in Spark and SQL;
- integer-ish outputs are LONG both sides (Spark counts are long; DuckDB
  COUNT is BIGINT; ranks cast to long explicitly);
- doubles follow the determinism rules in functions/scalar.py (exact-decimal
  accumulation; single-division ratios; no round() on hashed doubles);
- DuckDB numeric literals are DECIMAL — oracle SQL casts to DOUBLE wherever
  Spark computes a double.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import shapes
from ..session import tune

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Q2 — ranked counts + pct-of-total + latest-hour change (app.py:83-124)
# Testdata instantiation: orders ⋈ customer per mktsegment (FIXTURES §B).
# This is the flagship (SURVEY §7.1 minimum slice).
# ---------------------------------------------------------------------------

_Q2_SQL = """
WITH fact AS (
  SELECT o.o_orderdate, c.c_mktsegment
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), base AS (
  SELECT c_mktsegment,
         COUNT(*) AS order_count,
         COUNT(*)::DOUBLE * 100.0 / SUM(COUNT(*)) OVER () AS percentage,
         CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, c_mktsegment) AS BIGINT)
           AS "rank"
  FROM fact GROUP BY c_mktsegment
), hourly AS (
  SELECT c_mktsegment, date_trunc('hour', o_orderdate) AS bucket,
         COUNT(*) AS hourly_count
  FROM fact GROUP BY 1
  , 2
), changes AS (
  SELECT c_mktsegment, bucket,
         hourly_count - LAG(hourly_count)
           OVER (PARTITION BY c_mktsegment ORDER BY bucket) AS hourly_change
  FROM hourly
), latest AS (
  SELECT c_mktsegment, hourly_change FROM changes
  WHERE bucket = (SELECT MAX(bucket) FROM hourly)
)
SELECT b.c_mktsegment, b.order_count, b.percentage, b."rank",
       COALESCE(l.hourly_change, 0) AS hourly_change
FROM base b LEFT JOIN latest l USING (c_mktsegment)
"""


@query("q2_ranked_share", _Q2_SQL)
def q2_ranked_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Votes-by-candidate replica (app.py:83-124): broadcast inner join →
    grouped count → pct via whole-table window (W5) → row_number rank (W2)
    → LAG hourly change at the latest bucket (W1/O1) → COALESCE 0 (F4).

    Plan at scale: orders⋈customer shuffles on custkey (both sides big —
    sort-merge under AQE); everything downstream operates on segment-level
    aggregates (5 rows). The two aggregations (total + hourly) share the
    joined fact; Catalyst reuses the exchange where possible.
    """
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    fact = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).select("o_orderdate", "c_mktsegment")

    base = shapes.ranked_share(
        fact, ["c_mktsegment"], count_name="order_count",
        pct_name="percentage", rank_name="rank",
    )
    hourly = shapes.time_bucketed_counts(
        fact, "o_orderdate", "hour", ["c_mktsegment"], "bucket", "hourly_count"
    )
    changes = shapes.with_lag_delta(
        hourly, "bucket", "hourly_count", ["c_mktsegment"], "hourly_change"
    )
    max_bucket = hourly.groupBy().agg(F.max("bucket").alias("bucket"))
    latest = changes.join(F.broadcast(max_bucket), "bucket").select(
        "c_mktsegment", "hourly_change"
    )
    return base.join(latest, "c_mktsegment", "left").select(
        "c_mktsegment",
        "order_count",
        "percentage",
        "rank",
        F.coalesce("hourly_change", F.lit(0)).cast("long").alias("hourly_change"),
    )
