"""Skew-mitigation rewrites must be result-identical to their plain twins
(they are plan-level changes only), and the jaccard posting cap must be a
sound under-approximation."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_voting_system_spark.operators import dedup, skew


def _skewed(spark, n=20_000):
    """90% of rows on one key — the power-law shape salting targets."""
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, "hot")
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
        .alias("key"),
        (F.col("id") % 7).cast("long").alias("val"),
    )


def test_salted_count_matches_plain(spark):
    df = _skewed(spark)
    plain = {(r["key"], r["count"]) for r in df.groupBy("key").count().collect()}
    salted = {
        (r["key"], r["cnt"])
        for r in skew.salted_count(df, ["key"], salts=8).collect()
    }
    assert salted == plain


def test_salted_sum_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r["key"], r["s"])
        for r in df.groupBy("key").agg(F.sum("val").alias("s")).collect()
    }
    salted = {
        (r["key"], r["total"])
        for r in skew.salted_sum(df, ["key"], "val", salts=8).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    big = _skewed(spark, n=5000)
    small = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(50)],
        "key string, weight double",
    )
    plain = big.join(small, "key").groupBy("key").agg(
        F.sum("weight").alias("w"), F.count("*").alias("c")
    )
    salted = skew.salted_broadcast_left(big, small, "key", salts=4).groupBy(
        "key"
    ).agg(F.sum("weight").alias("w"), F.count("*").alias("c"))
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_jaccard_posting_cap_is_sound(spark, sf_dir):
    """Capped variant: subset of the exact pairs, never a higher score."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.3, max_postings=10
        ).collect()
    }
    assert set(capped) <= set(exact)
    for pair, score in capped.items():
        assert score <= exact[pair] + 1e-12


def test_registered_salted_agg_plans_two_phase(spark, sf_dir):
    """a19_salted_agg must actually shuffle on (key, salt) first — the
    salted partial phase is visible as __salt in the executed plan."""
    from realtime_voting_system_spark.plans.parity import QUERIES

    df = QUERIES["a19_salted_agg"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_salted_agg_multi_equals_plain(spark, sf_dir):
    """salted_agg with several aggregates in ONE pass equals the plain
    groupBy bit-for-bit (decimal sum → order-free merge), and the plan
    contains exactly one salted partial phase (one scan, two shuffles —
    not a pass per aggregate)."""
    from pyspark.sql import functions as F

    from realtime_voting_system_spark.operators import skew

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(38,2)").alias("qd"),
    )
    got = skew.salted_agg(
        li,
        ["l_returnflag"],
        [
            (F.count("*"), "sum", "cnt"),
            (F.sum("qd"), "sum", "total"),
            (F.min("qd"), "min", "lo"),
            (F.max("qd"), "max", "hi"),
        ],
    )
    plain = li.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.sum("qd").alias("total"),
        F.min("qd").alias("lo"),
        F.max("qd").alias("hi"),
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 2  # final+initial AQE sections
