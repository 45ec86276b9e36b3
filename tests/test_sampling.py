"""Deterministic sampling/split operators (operators/sampling.py): the
driver oracle pins cross-engine values; these pin the semantic properties
a pipeline relies on (stability, independence, leakage detection)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_voting_system_spark.operators import sampling

FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_split_stable_under_partitioning_and_growth(spark, sf_dir):
    """Assignment is a pure function of id: repartitioning must not move a
    row, and adding new rows must not move existing ones (the property
    randomSplit lacks)."""
    docs = _docs(spark, sf_dir).select("doc_id")
    base = {
        r.doc_id: r.split
        for r in sampling.hash_split(docs, fractions=FRACS).collect()
    }
    shuffled = {
        r.doc_id: r.split
        for r in sampling.hash_split(
            docs.repartition(13), fractions=FRACS
        ).collect()
    }
    assert base == shuffled
    grown = docs.unionByName(
        docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"))
    )
    regrown = {
        r.doc_id: r.split
        for r in sampling.hash_split(grown, fractions=FRACS).collect()
    }
    assert all(regrown[k] == v for k, v in base.items())


def test_split_fractions_approximate(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id")
    counts = dict(
        sampling.hash_split(docs, fractions=FRACS)
        .groupBy("split")
        .count()
        .collect()
    )
    n = sum(counts.values())
    assert set(counts) <= set(FRACS)
    for name, frac in FRACS.items():
        got = counts.get(name, 0) / n
        assert abs(got - frac) < 0.06, (name, got)


def test_sample_fraction_reproducible_subset(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id")
    a = {r.doc_id for r in sampling.sample_fraction(docs, 0.2).collect()}
    b = {
        r.doc_id
        for r in sampling.sample_fraction(docs.repartition(5), 0.2).collect()
    }
    assert a == b
    smaller = {r.doc_id for r in sampling.sample_fraction(docs, 0.1).collect()}
    assert smaller <= a  # nested samples: u < .1 implies u < .2
    n = docs.count()
    assert abs(len(a) / n - 0.2) < 0.08


def test_split_and_sample_draws_independent(spark, sf_dir):
    """Different salts ⇒ different uniforms: the 10% sample must not be a
    subset of any one split (which would mean correlated draws)."""
    docs = _docs(spark, sf_dir).select("doc_id")
    labeled = sampling.hash_split(docs, fractions=FRACS)
    sampled = sampling.sample_fraction(docs, 0.5)
    joint = dict(
        labeled.join(sampled.withColumn("in_sample", F.lit(1)), "doc_id", "left")
        .groupBy("split")
        .agg(F.avg(F.coalesce("in_sample", F.lit(0))).alias("rate"))
        .collect()
    )
    for split, rate in joint.items():
        assert 0.3 < rate < 0.7, (split, rate)


def test_contamination_finds_planted_leak(spark, sf_dir):
    """Plant test-side copies of train docs (same text modulo case — the
    normalized fingerprint collapses it) and verify every planted pair is
    reported exactly once."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    train = docs.limit(20)
    leaked = train.limit(5).select(
        (F.col("doc_id") + 500_000).alias("doc_id"),
        F.upper(F.col("text")).alias("text"),
    )
    clean_test = docs.filter(F.col("doc_id") >= 100).limit(20)
    test = clean_test.unionByName(leaked)
    found = sampling.split_contamination(train, test).collect()
    pairs = {(r.train_id, r.test_id) for r in found}
    assert {(i, i + 500_000) for i in range(5)} <= pairs
    assert len(found) == len(pairs)  # no duplicate reports


def test_shuffle_shard_positions_and_balance(spark):
    """Shard positions are contiguous 1..n per shard, every row appears
    exactly once, and a different seed permutes the order."""
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = sampling.shuffle_shard(df, n_shards=4, seed="s1").collect()
    assert len(out) == 500
    assert {r.shard_id for r in out} == {0, 1, 2, 3}
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard_id, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.sort_key)
        assert [r.shard_pos for r in rows] == list(range(1, len(rows) + 1))
        # balanced within 4x of ideal (uniform hash over 125/shard)
        assert 40 <= len(rows) <= 250
    other = sampling.shuffle_shard(df, n_shards=4, seed="s2").collect()
    k1 = sorted(out, key=lambda r: (r.shard_id, r.shard_pos))
    k2 = sorted(other, key=lambda r: (r.shard_id, r.shard_pos))
    assert [r.doc_id for r in k1] != [r.doc_id for r in k2]


def test_fuzzy_contamination_planted_near_dup(spark):
    """Planted leaks: an exact cross-split copy (dist 0), a 3-edit
    variant (dist 3), and an unrelated doc (absent). The q-gram
    filter-verify must find exactly the planted pairs with exact
    distances; a same-split near-dup never pairs (cross-split only)."""
    base = (
        "the committee approved the quarterly infrastructure budget "
        "after reviewing seventeen separate proposals from the field"
    )
    edited = base.replace("seventeen", "sevanteen").replace(
        "budget", "budgets"
    )  # 1 sub + 1 insert + ... exact dist computed below
    train = spark.createDataFrame(
        [(1, base), (2, "completely different content about marine "
                        "biology and deep sea exploration vessels")],
        ["doc_id", "text"],
    )
    test = spark.createDataFrame(
        [(10, base), (11, edited)], ["doc_id", "text"]
    )
    got = {
        (r.train_id, r.test_id): r.edit_dist
        for r in sampling.fuzzy_contamination(
            train, test, max_dist=10, min_shared=3
        ).collect()
    }
    import duckdb

    con = duckdb.connect()
    expect_dist = con.execute(
        "SELECT levenshtein(?, ?)", [base, edited]
    ).fetchone()[0]
    con.close()
    assert got[(1, 10)] == 0
    assert got[(1, 11)] == expect_dist and 0 < expect_dist <= 10
    assert all(t == 1 for t, _ in got)  # doc 2 never pairs


def test_fuzzy_contamination_posting_cap_drops_boilerplate_only_pairs(spark):
    """With max_postings=1 every shared gram (appearing in ≥2 docs) is
    capped away, so even an exact copy produces no candidates — the cap
    is real and part of the semantics, not advisory."""
    txt = "alpha bravo charlie delta echo foxtrot golf hotel india"
    train = spark.createDataFrame([(1, txt)], ["doc_id", "text"])
    test = spark.createDataFrame([(10, txt)], ["doc_id", "text"])
    assert (
        sampling.fuzzy_contamination(
            train, test, min_shared=1, max_postings=1
        ).count()
        == 0
    )
    assert (
        sampling.fuzzy_contamination(
            train, test, min_shared=1, max_postings=2
        ).count()
        == 1
    )


def test_weighted_sample_proportionality_and_determinism(spark):
    """X259: on a planted two-weight population (w=1 vs w=10), priority
    sampling's inclusion counts aggregated over many independent salts
    scale ~with weight (k<<n regime: P(in) ~ k*w/SUM w, so the heavy
    group should appear ~10x as often); each single draw is exactly k
    rows, bitwise deterministic, and repartition-invariant."""
    n_half, k, n_salts = 200, 40, 25
    rows = [(i, 1 if i < n_half else 10) for i in range(2 * n_half)]
    df = spark.createDataFrame(rows, "doc_id long, weight long")

    heavy = light = 0
    first = None
    for s in range(n_salts):
        got = sampling.weighted_sample(
            df, k=k, weight_col="weight", salt=f"ws{s}"
        ).collect()
        assert len(got) == k
        assert sorted(r.rank for r in got) == list(range(1, k + 1))
        heavy += sum(1 for r in got if r.weight == 10)
        light += sum(1 for r in got if r.weight == 1)
        if s == 0:
            first = sorted((r.doc_id, r.priority, r.rank) for r in got)
    assert heavy + light == k * n_salts
    ratio = heavy / max(light, 1)
    assert 6.0 < ratio < 16.0, (heavy, light)  # ~10 expected

    # determinism: same salt again, shuffled layout → identical draw
    again = sorted(
        (r.doc_id, r.priority, r.rank)
        for r in sampling.weighted_sample(
            df.repartition(13), k=k, weight_col="weight", salt="ws0"
        ).collect()
    )
    assert again == first


def test_weighted_sample_edge_cases(spark):
    """X259 edges: k beyond the population returns every row (ranked,
    no padding); uniform weights degrade to plain bottom-k by the hash
    uniform (the unweighted deterministic sample); weight=1 vs
    weight=1000 on a two-row table picks the heavy row first."""
    df = spark.createDataFrame(
        [(i, 1) for i in range(7)], "doc_id long, weight long"
    )
    got = sampling.weighted_sample(df, k=100, weight_col="weight").collect()
    assert len(got) == 7
    assert sorted(r.rank for r in got) == list(range(1, 8))

    # uniform weights: selection order == ascending hash uniform
    by_rank = [r.doc_id for r in sorted(got, key=lambda r: r.rank)]
    by_u = [r.doc_id for r in sorted(got, key=lambda r: (r.priority, r.doc_id))]
    assert by_rank == by_u

    two = spark.createDataFrame(
        [(1, 1), (2, 1000)], "doc_id long, weight long"
    )
    picks = {
        r.doc_id
        for s in range(10)
        for r in sampling.weighted_sample(
            two, k=1, weight_col="weight", salt=f"e{s}"
        ).collect()
    }
    # the 1000x-heavier row must dominate across salts (P(light) ~ 1e-3)
    assert picks == {2}
