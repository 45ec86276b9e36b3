"""Bucketed co-located joins: result parity with the plain join AND the
plan property that makes bucketing worth it — no shuffle above the scans.

Broadcast is disabled inside these tests: a dimension this small would
broadcast and bypass the bucketed path entirely (the planner marks scans
"Bucketed: false (disabled by query planner)"); bucketing is the lever for
fact ⋈ fact joins where neither side broadcasts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_voting_system_spark.sources import bucketing


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    bucketing.write_bucketed(
        orders,
        "orders_b",
        ("o_custkey",),
        n_buckets=4,
        sort_cols=("o_custkey",),
        path=str(wh / "orders_b"),
    )
    bucketing.write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b",
        ("o_custkey",),
        n_buckets=4,
        sort_cols=("o_custkey",),
        path=str(wh / "customer_b"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield orders, customer
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_matches_plain(spark, bucketed_tables):
    orders, customer = bucketed_tables

    def agg(df):
        # decimal accumulation: double sums are shuffle-order-dependent
        return df.groupBy("c_mktsegment").agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
        )

    plain = agg(
        orders.join(
            customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
        )
    )
    buck = agg(
        bucketing.bucketed_join(spark, "orders_b", "customer_b", ["o_custkey"])
    )
    assert sorted(plain.collect()) == sorted(buck.collect())


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    df = bucketing.bucketed_join(spark, "orders_b", "customer_b", ["o_custkey"])
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    joined = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in joined, joined
    assert "SortMergeJoin" in joined
    # pre-sorted buckets: the merge join needs no extra Sort
    assert "Bucketed: true" in joined
