"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (its only dedup is the DB's UNIQUE(voter_id)
constraint, setup_database.py:105 — replicated for streams in streaming/);
these are the batch-scale variants the driver grades as first-class:

- exact          — hash-groupBy on a normalized fingerprint
- n-gram Jaccard — shingle self-join with exact pairwise Jaccard
- MinHash + LSH  — banded minhash signatures → candidate pairs → verify
- SimHash        — 64-bit sign-aggregated token hashes → Hamming bands
- embedding      — cosine near-dup pairs (see similarity.py for ANN)

All pure DataFrame ops (explode/groupBy/join) — no Python in the hot path.
Each docstring carries the 100 TB scale argument for its shuffle layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize, tokens, word_ngrams


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a CPU-heavy narrow input across all cores.

    Small parquet files arrive as ONE split (maxPartitionBytes is a byte
    bound), serializing per-row work like shingling/hashing onto one core —
    measured 12s for 5k docs. At 100 TB inputs arrive in thousands of
    splits and this is a no-op cost-wise; locally it is the difference
    between 1× and 32× CPU.
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group by md5 of the normalized text; keep the minimum id as canonical.

    Scale: one hash-aggregate shuffle keyed by a 128-bit fingerprint —
    uniformly distributed, no skew. Shuffle rows carry (fingerprint, id),
    never the document body. This is THE 100 TB exact-dedup plan.
    """
    fp = F.md5(normalize(F.col(text_col))).alias("fingerprint")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
    )


def drop_exact_dups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Filter to one representative row per distinct normalized text."""
    keep = exact_dedup(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# Shingling (shared by Jaccard / MinHash)
# ---------------------------------------------------------------------------


def shingle_sets(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingles: array<string>) — distinct word n-grams per document.

    Tokenization is materialized in its OWN projection: inlining
    ``tokens(text)`` into the n-gram lambda makes Catalyst re-evaluate
    split+filter once per shingle index — O(tokens²) per document
    (measured 26 s to shingle 5k docs; 2 s split out). CollapseProject
    keeps the stages separate because ``toks`` is referenced twice and
    split is non-cheap.
    """
    toked = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("toks")
    )
    return toked.select(
        F.col(id_col),
        F.array_distinct(word_ngrams(F.col("toks"), n)).alias("shingles"),
    )


def _exploded(shingles_df: DataFrame, id_col: str) -> DataFrame:
    return shingles_df.select(
        id_col, F.explode("shingles").alias("shingle")
    )


# ---------------------------------------------------------------------------
# Exact pairwise n-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_postings: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with Jaccard(shingles_a, shingles_b) ≥ t.

    jaccard = |A∩B| / (|A| + |B| − |A∩B|) — a single division of exact ints,
    so the value hash matches any engine computing the same formula.

    Scale: the self-join is keyed on shingle — pairs are only generated for
    docs sharing ≥1 shingle, and the join shuffles (shingle, id) pairs, not
    documents. Hot shingles (stopword n-grams) create quadratic blowup: a
    shingle shared by k docs emits k² join rows. ``max_postings=L`` drops
    shingles appearing in more than L docs from the JOIN side only (they
    carry no discriminative signal; set sizes keep counting them, so
    jaccard becomes a ≤-true approximation — pairs sharing ONLY hot
    shingles are missed, scores of found pairs are exact). At 100 TB this
    cap is mandatory; leave None for the exact oracle-matched variant.
    This exact variant is the verifier behind MinHash; MinHash+bands is the
    candidate generator that avoids the full join at scale.
    """
    # One materialization feeds both self-join sides + the size lookup —
    # higher-order-function eval (zip_with/array_distinct) is interpreted,
    # not codegen'd, so recomputing it 3× dominates runtime. The cached
    # set is (id, shingles) only — ~bytes-per-doc, spillable at scale.
    sh = shingle_sets(_spread(df), id_col, text_col, n).cache()
    sizes = sh.select(
        F.col(id_col), F.size("shingles").cast("long").alias("set_size")
    )
    e = _exploded(sh, id_col)
    if max_postings is not None:
        freq = e.groupBy("shingle").agg(F.count("*").alias("__pf"))
        e = (
            e.join(freq.filter(F.col("__pf") <= max_postings), "shingle")
            .drop("__pf")
        )
    a = e.alias("a")
    b = e.alias("b")
    common = (
        a.join(b, (F.col(f"a.shingle") == F.col(f"b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.col("size_a") + F.col("size_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "common", "size_a", "size_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) — minhash over word n-grams.

    Hash family: ONE xxhash64 per shingle folded to 32 bits, then
    ``num_hashes`` affine mixes h_i = (a_i·h + b_i) mod p (p prime > 2^32,
    a_i < 2^30 so every product < 2^62 — ANSI-safe, no overflow). This is
    the classic universal family; ~60× cheaper than hashing each shingle
    num_hashes times (measured 20s → sub-second on 260k shingles).

    Scale: explode produces #shingles rows keyed by doc id; the aggregate's
    partial min per map task bounds shuffle volume by (#docs × num_hashes).
    Empty docs yield an empty shingle array and are filtered out.
    """
    p = 4294967311  # smallest prime > 2^32
    coeffs, state = [], 42
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (state >> 33) | 1  # odd, < 2^31; shifted again below to < 2^30
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        coeffs.append(((a >> 1) | 1, state % p))
    # NOT shingle_sets: minhash is invariant to duplicate shingles (min is
    # idempotent), so skip the per-doc array_distinct — interpreted
    # higher-order eval is the cost floor here.
    toked = _spread(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("toks")
    )
    nonempty = toked.select(
        F.col(id_col), word_ngrams(F.col("toks"), n).alias("shingles")
    ).filter(F.size("shingles") > 0)
    sh = _exploded(nonempty, id_col)
    # materialize the base hash once; inlined it would be re-evaluated in
    # each of the num_hashes mix columns (subexpr elimination does not
    # reach across all codegen paths)
    based = sh.select(
        id_col,
        F.pmod(F.xxhash64("shingle"), F.lit(4294967296).cast("long")).alias(
            "h32"
        ),
    )
    h32 = F.col("h32")
    hashed = based.select(
        id_col,
        *[
            ((h32 * F.lit(a) + F.lit(b)) % F.lit(p)).alias(f"h{i}")
            for i, (a, b) in enumerate(coeffs)
        ],
    )
    out = hashed.groupBy(id_col).agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    return out.select(
        id_col, F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """Candidate pairs via banded LSH, optionally verified with exact Jaccard.

    rows-per-band r = num_hashes/bands; collision prob at jaccard j is
    1-(1-j^r)^bands (r=4, b=16 → s-curve centered ≈ 0.5).

    Scale: candidates come from groupBy(band, band-hash) — docs only meet if
    a whole band matches, so the shuffle is (#docs × bands) rows. The
    verify step re-joins only candidate ids against shingle sets (semi-join
    pruned), never all pairs. This is the canonical petabyte dedup layout.
    """
    r = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes).cache()
    banded = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.col("sig")[b * r + j] for j in range(r)]).alias(
                            "bucket"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    if not verify:
        return cands
    sh = shingle_sets(_spread(df), id_col, text_col, n).cache()
    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """(id, simhash: long) — sign-aggregated token hashes.

    bit_b(doc) = 1 iff Σ_tokens (bit_b(xxhash64(token)) ? +1 : −1) > 0.
    The ±1 sum is computed branch-free as 2·Σ bit_b − n_tokens (identical
    integer value), so the aggregate input is a bare shift-and-mask per
    bit — one shuffle of (id, token-hash) pairs; all sums map-side partial.
    """
    toks = _spread(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("th", F.xxhash64("tok"))
    sums = toks.groupBy(id_col).agg(
        F.count("*").alias("__n"),
        *[
            F.sum(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1))).alias(
                f"b{b}"
            )
            for b in range(bits)
        ],
    )
    sim = None
    for b in range(bits):
        pos = (F.col(f"b{b}") * 2) > F.col("__n")
        term = F.when(pos, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(0)
        sim = term if sim is None else sim + term
    return sums.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Banding: split the 64-bit hash into `bands` 16-bit chunks; any pair
    within Hamming ≤ bands−1 shares ≥1 exact chunk (pigeonhole), so the
    join is keyed on (band, chunk) — no all-pairs comparison. Hamming is
    then verified exactly with bit_count(xor).
    """
    hs = simhash(df, id_col, text_col)
    width = 64 // bands
    banded = hs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.chunk")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        pairs.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_on_label: str | None = None,
) -> DataFrame:
    """Pairs with cosine ≥ threshold. Brute-force within optional blocking
    key (e.g. a cluster/label column) — at 100 TB use similarity.ann_lsh
    buckets as the blocking key instead of an O(n²) cross join."""
    from ..functions.vectors import as_double, cosine

    v = df.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("v"),
        *( [F.col(block_on_label)] if block_on_label else [] ),
    )
    a, b = v.alias("a"), v.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_on_label:
        cond = cond & (F.col(f"a.{block_on_label}") == F.col(f"b.{block_on_label}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_dup_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via multi-table hyperplane-LSH blocking → exact cosine
    verify — the 100 TB embedding-dedup plan. ``embedding_dup_pairs`` (above)
    is the all-pairs small-n verifier; THIS is the registered scale path.

    Candidate generation: each vector gets one packed sign-bit bucket per
    table (planes seeded ``seed + t``, mirroring ann_lsh's table layout); a
    pair is compared only if its full bucket matches in ≥1 table — an
    equi-join on (tbl, bucket), never an all-pairs cross join. Shuffle is
    (#vectors × n_tables) 16-byte signature rows for the join plus a keyed
    re-join of vectors onto surviving candidate ids. Collision prob at angle
    θ is 1−(1−(1−θ/π)^planes)^tables; recall tunes with n_tables exactly as
    in similarity.ann_lsh_topk.

    Determinism: plane literals + sequential-fold dot ⇒ buckets and cosines
    bit-match the DuckDB oracle twin (plans/pipeline_ops.py emits the same
    planes as SQL literals).
    """
    from ..functions.vectors import as_double, cosine
    from .similarity import lsh_bucket_expr

    v = df.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    bands = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket_expr(F.col("v"), dim, n_planes, seed + t).alias(
                    "bucket"
                ),
            )
            for t in range(n_tables)
        ]
    )
    banded = v.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col, F.col("bb.tbl").alias("tbl"), F.col("bb.bucket").alias("bucket")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    va = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
    vb = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos_sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
