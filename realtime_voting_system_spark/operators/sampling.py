"""Deterministic sampling / split operators for training-data pipelines.

The reference has no sampling surface (its generator posts every voter —
data_generator.py); these are the corpus-management operators a 100 TB
training pipeline needs around the dedup/quality stages:

- ``hash_split``      — reproducible train/val/test assignment by id hash
- ``sample_fraction`` — reproducible Bernoulli sample by id hash
- ``split_contamination`` — exact-duplicate leakage across two splits

All are pure narrow projections / keyed joins — no RNG state, no shuffle
for the assignment itself, stable under re-runs, cluster resizes, task
retries, and data growth (an existing row never changes split when rows
are added — the property `df.randomSplit` famously lacks, since it
re-derives from partition layout).

Determinism contract: the unit interval draw is the first 8 md5 hex chars
of ``salt:id`` scaled by 2^-32 — computable bit-identically in Spark
(conv/substring/md5), Python, and DuckDB, so every operator here carries a
full value-hash oracle (plans/pipeline_ops.py).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize


def _unit_hash(id_col: Column, salt: str) -> Column:
    """u ∈ [0,1): md5-derived 32-bit uniform, keyed by salt so independent
    decisions (split vs sample) draw independent uniforms from one id."""
    h32 = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return h32 / F.lit(float(1 << 32))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: Mapping[str, float] | None = None,
    salt: str = "split",
    out: str = "split",
) -> DataFrame:
    """Append a split label by cumulative hash thresholds.

    ``fractions`` preserves insertion order (e.g. {"train": .8, "val": .1,
    "test": .1}); anything past the final cumulative bound falls into the
    LAST split, so fractions that do not sum to exactly 1.0 are safe.

    Scale: one narrow projection — no shuffle, no sort, no sample pass.
    At 100 TB this is the only split that works: assignment is a pure
    function of the row id, so train/val/test can be computed
    independently by any job at any time and always agree.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    u = _unit_hash(F.col(id_col), salt)
    names = list(fractions)
    expr, cum = None, 0.0
    for name in names[:-1]:
        cum += fractions[name]
        branch = F.when(u < cum, F.lit(name))
        expr = branch if expr is None else expr.when(u < cum, F.lit(name))
    label = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out, label)


def sample_fraction(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Reproducible Bernoulli sample: keep rows with u < fraction.

    Unlike ``df.sample`` (partition-layout-dependent RNG), membership is a
    pure function of (salt, id): re-runs, retries, and repartitioning all
    return the same sample, and two jobs sampling the same table get the
    same rows — the property that makes a sample citable in a data card.
    """
    return df.filter(_unit_hash(F.col(id_col), salt) < fraction)


def split_contamination(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(train_id, test_id, fingerprint) — exact-duplicate leakage across a
    split boundary: pairs whose NORMALIZED text is identical. The eval-set
    contamination check every pretraining pipeline runs after splitting.

    Scale: both sides reduce to (fingerprint, id) before the join — one
    hash-shuffle each, bodies never move; the join is keyed on a uniform
    128-bit hash (no skew). Near-dup contamination composes the same way
    from minhash_lsh_pairs on the union.
    """
    fp = lambda d, name: d.select(  # noqa: E731 — tiny local projection
        F.md5(normalize(F.col(text_col))).alias("fingerprint"),
        F.col(id_col).alias(name),
    )
    return (
        fp(train, "train_id")
        .join(fp(test, "test_id"), "fingerprint")
        .select("train_id", "test_id", "fingerprint")
    )


def stratified_sample(
    df: DataFrame,
    fractions: Mapping[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample — the corpus-balancing
    step (e.g. downsample the dominant language, keep the rest whole).
    Keep probability is ``fractions[stratum]``; strata absent from the map
    are DROPPED (explicit curation contract, not silent passthrough).

    Same determinism story as ``sample_fraction``: membership is a pure
    function of (salt, id), so resizes/retries/re-runs agree, and the
    draw is independent of the plain sample's draw (different salt). One
    narrow projection — no shuffle, no per-stratum pass (the naive
    ``sampleBy`` equivalent re-derives from partition layout and is not
    reproducible across jobs).
    """
    u = _unit_hash(F.col(id_col), salt)
    frac = None
    for name, f in fractions.items():
        cond, val = F.col(strata_col) == name, F.lit(float(f))
        frac = F.when(cond, val) if frac is None else frac.when(cond, val)
    frac = F.lit(0.0) if frac is None else frac.otherwise(F.lit(0.0))
    return df.filter(u < frac)


def rebalance_epochs(
    df: DataFrame,
    epochs: Mapping[str, int],
    strata_col: str = "lang",
    out: str = "epoch",
) -> DataFrame:
    """Integer oversampling by stratum: emit each row ``epochs[stratum]``
    times with a 1-based ``epoch`` index — the "N epochs of Wikipedia, 1 of
    web" mixing recipe, materialized deterministically (no RNG) so the
    resulting corpus is citable and re-derivable.

    Scale: explode(sequence(1, n)) is a generator in the same stage as the
    scan — rows never shuffle, output size is exactly sum(n_s·|s|). Strata
    absent from the map default to 1 epoch.
    """
    n = None
    for name, e in epochs.items():
        cond, val = F.col(strata_col) == name, F.lit(int(e))
        n = F.when(cond, val) if n is None else n.when(cond, val)
    n = F.lit(1) if n is None else n.otherwise(F.lit(1))
    return df.withColumn(
        out, F.explode(F.sequence(F.lit(1).cast("long"), n.cast("long")))
    )


def ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    n: int = 5,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """N-gram-level eval contamination: (train_id, test_id, n_shared) for
    cross-split pairs sharing ≥ ``min_shared`` distinct word n-grams — the
    decontamination check real eval suites run (GPT-3 appendix C /
    13-gram-style overlap), catching partial inclusions that exact
    fingerprints miss.

    Scale: each side reduces to exploded (n-gram, id) postings — bodies
    never shuffle; the cross-split equi-join is keyed on the n-gram. Hot
    n-grams amplify the join quadratically exactly like dedup's shingle
    join; compose with a posting cap upstream (dedup.ngram_jaccard_pairs'
    ``max_postings``) when running at full scale.
    """
    from ..functions.text import tokens, word_ngrams

    def postings(d: DataFrame, name: str) -> DataFrame:
        toked = d.select(
            F.col(id_col).alias(name), tokens(F.col(text_col)).alias("toks")
        )
        return toked.select(
            name,
            F.explode(
                F.array_distinct(word_ngrams(F.col("toks"), n))
            ).alias("ngram"),
        )

    return (
        postings(train, "train_id")
        .join(postings(test, "test_id"), "ngram")
        .groupBy("train_id", "test_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def shuffle_shard(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "shuffle",
) -> DataFrame:
    """Deterministic global corpus shuffle + shard assignment for training
    export.

    Training jobs want the corpus in a reproducible pseudorandom order,
    split into N equal-ish shard files.  ``sort_key = md5(seed:id)`` is a
    uniform total order (reshuffling = changing the seed); ``shard_id``
    is a uniform 32-bit hash mod N, so shards are balanced without any
    global statistics pass; ``shard_pos`` is the row's position within
    its shard under the key order.

    Scale: shard assignment is a pure projection (no shuffle).  The only
    shuffle is the per-shard ordering — exactly the
    ``repartition(shard).sortWithinPartitions(key)`` any full-corpus
    shuffle must pay; no global sort, no single-partition window (the
    window below partitions by shard — at scale use one shard per target
    file, thousands of them).  Export = ``write.partitionBy(shard_id)``
    with the same sort.
    """
    from pyspark.sql.window import Window

    key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    h32 = F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
    with_shard = df.select(
        F.col(id_col),
        key.alias("sort_key"),
        F.pmod(h32, F.lit(n_shards)).cast("int").alias("shard_id"),
    )
    w = Window.partitionBy("shard_id").orderBy("sort_key")
    return with_shard.withColumn(
        "shard_pos", F.row_number().over(w).cast("long")
    )


def fuzzy_contamination(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 20,
    q: int = 8,
    min_shared: int = 10,
    max_postings: int = 100,
) -> DataFrame:
    """Edit-distance eval contamination: (train_id, test_id, edit_dist)
    for cross-split pairs whose NORMALIZED texts are within ``max_dist``
    Levenshtein edits — the near-verbatim leak (typo / punctuation /
    template variants) that exact fingerprints miss entirely and n-gram
    overlap only ranks, never bounds.

    Filter-verify shape (the classic q-gram similarity join, Gravano et
    al. VLDB'01): candidates are cross-split pairs sharing ≥
    ``min_shared`` DISTINCT char ``q``-grams. Strings within edit
    distance d share at least (l − q + 1) − q·d grams *counted with
    multiplicity*; postings here are distinct grams, so the Gravano
    bound — and hence losslessness for docs longer than ~q·(d+1)+
    min_shared chars — holds only for mostly-distinct-gram text.
    Highly repetitive documents (a long run of one character has a
    single distinct gram) can defeat the filter at any length, so the
    filter is a high-recall heuristic, not a guarantee; engine parity
    is unaffected (the oracle applies the identical distinct filter).
    Candidates then pay the O(l²) Levenshtein verify, behind an
    |len(a)−len(b)| ≤ d pre-filter (length difference lower-bounds edit
    distance).

    ``max_postings`` drops q-grams appearing in more than that many docs
    (across both sides) from candidate generation — hot boilerplate
    grams are what make the gram join quadratic (measured 72 s → 0.7 s
    at sf0.1 for 86% of the hits), and near-dup pairs always share
    plenty of RARE grams, so the cap costs recall only for pairs whose
    entire overlap is boilerplate. Part of the operator's semantics
    (the oracle applies the same cap), as in dedup_ngram_jaccard_capped.

    Scale: both sides reduce to (q-gram, id) postings — bodies never
    shuffle into the gram join; texts re-join candidates by key for the
    verify.
    """
    from ..functions.text import normalize

    def side(d: DataFrame, name: str, tname: str) -> tuple:
        nt = d.select(
            F.col(id_col).alias(name),
            normalize(F.coalesce(F.col(text_col), F.lit(""))).alias(tname),
        )
        postings = (
            nt.filter(F.length(tname) >= q)
            .select(
                name,
                F.explode(
                    F.sequence(F.lit(0), F.length(tname) - q)
                ).alias("s"),
                tname,
            )
            .select(name, F.expr(f"substring({tname}, s + 1, {q})").alias("g"))
            .distinct()
        )
        return nt, postings

    ttexts, tp = side(train, "train_id", "tt")
    stexts, sp = side(test, "test_id", "st")
    # postings are distinct per (id, gram) per side, so count(*) over the
    # tagged union is the gram's doc count across both sides
    okg = (
        tp.select("g").withColumn("__s", F.lit(0))
        .unionByName(sp.select("g").withColumn("__s", F.lit(1)))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= max_postings)
        .select("g")
    )
    cand = (
        tp.join(okg, "g")
        .join(sp, "g")
        .groupBy("train_id", "test_id")
        .agg(F.count(F.lit(1)).alias("__shared"))
        .filter(F.col("__shared") >= min_shared)
        .select("train_id", "test_id")
    )
    return (
        cand.join(ttexts, "train_id")
        .join(stexts, "test_id")
        .filter(
            F.abs(F.length("tt") - F.length("st")) <= max_dist
        )
        .select(
            "train_id",
            "test_id",
            F.levenshtein("tt", "st").cast("long").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= max_dist)
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: priority
    sampling (Duffield–Lund–Thorup, JACM 2007) — item i draws a hash
    uniform u_i and gets priority w_i/u_i; the k largest priorities form
    the sample, so inclusion odds scale with weight while re-runs,
    retries, and repartitioning reproduce the identical draw (the
    citable-sample property sample_fraction has, extended to weights —
    this is how quality-weighted corpus subsampling ships).

    Exactness: top-k by w/u is the same order as bottom-k by u/w, which
    is computed as the INTEGER floor(u·2³⁰ / w) with an (priority, id)
    tiebreak — a total order in pure integer arithmetic, bitwise
    identical across engines and partitionings (float pow/division
    orderings are last-ulp engine-dependent and cannot sit under a hash
    gate). The floor only merges rationals within 2⁻³⁰ relative, where
    the id tiebreak decides identically everywhere. ``weight_col`` must
    be a positive integer column with u·2³⁰ ≤ 2⁶² headroom (u is
    32-bit).

    Scale: one narrow projection + TakeOrderedAndProject top-k
    (map-side partial top-k per partition — no global sort, no
    shuffle of non-winners); the rank window runs on the k-row result
    only. Different salts draw independent samples.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 1
    )
    from pyspark.sql import Window

    picked = (
        df.withColumn("__u", u)
        .withColumn(
            "priority",
            F.expr(f"(__u * 1073741824) div `{weight_col}`").cast("long"),
        )
        .drop("__u")
        .orderBy("priority", id_col)
        .limit(int(k))
    )
    w = Window.orderBy("priority", id_col)
    return picked.withColumn(
        "rank", F.row_number().over(w).cast("long")
    )


def weighted_sample_by_group(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_cols: tuple[str, ...] = ("source",),
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Stratified form of ``weighted_sample``: k items PER GROUP by the
    same integer-exact DLT priorities — every stratum stays represented
    while weights bias selection within it (the quality-weighted
    per-domain quota). Selection is one rank window over (priority, id)
    per group — a single hash shuffle on the group key; Spark's
    map-side WindowGroupLimit drops non-top-k rows before the exchange,
    so hot groups never funnel their full membership through one
    reducer. Same determinism contract as weighted_sample (same salt →
    same draw within each group)."""
    from pyspark.sql import Window

    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 1
    )
    w = Window.partitionBy(*group_cols).orderBy("priority", id_col)
    return (
        df.withColumn("__u", u)
        .withColumn(
            "priority",
            F.expr(f"(__u * 1073741824) div `{weight_col}`").cast("long"),
        )
        .drop("__u")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
    )
