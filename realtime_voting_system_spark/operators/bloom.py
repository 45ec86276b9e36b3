"""Bloom-filter join pruning: build a compact bitmap of the build side's
join keys, probe it on the fact side BEFORE the shuffle, and let the exact
join run on the survivors.

At 100 TB this is the standard trick for a selective semi-join (Spark's
own runtime row-group filtering does a JVM-internal version): when the
build side keeps only 5% of orders, probing a ~8 KB bitmap in the scan
stage drops ~95% of lineitem rows before they are ever shuffled or
broadcast-matched. Bloom filters have NO false negatives, so
``bloom ∧ exact-join ≡ exact-join`` — the prefilter can only remove rows
the join would drop anyway, which is exactly what the driver oracle for
``j26_bloom_semi`` checks (DuckDB runs the plain semi-join; Spark runs
bloom + semi-join; hashes must agree).

Hashing: ONE md5 digest per key (the portable hash family,
operators/dedup.py:263 pattern), with the k bit positions taken from k
disjoint 8-hex-char slices of the same digest — one hash computation per
row instead of k (measured 5.1 s → ~1 s at sf0.1). md5's slices are
independently uniform; k ≤ 4 fits the 32-hex digest.

Representation: the m-bit filter aggregates to (word index, 64-bit word)
rows via one ``bit_or`` — m/64 rows (1024 for the default 64 Kbit) — then
inlines into the probe as a literal array (the size is bounded by m, a
config constant, NEVER by data: the sanctioned bounded-collect contract,
like IVF centroids). The probe is a pure projection — array index + bit
test inside whole-stage codegen, no join, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAX_K = 4  # 4 disjoint 8-hex slices per 32-hex md5 digest


def _digest(key: Column, seed: str) -> Column:
    return F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))


def _positions(dig: Column, k: int, m_bits: int) -> list[Column]:
    """k bit positions from disjoint 8-hex slices of one digest."""
    return [
        F.conv(F.substring(dig, 1 + 8 * i, 8), 16, 10).cast("long") % m_bits
        for i in range(k)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 3,
    seed: str = "bloom",
) -> DataFrame:
    """Build the (word, bits) bitmap from the build side's key column.

    One explode over k positions per key + one ``bit_or`` hash aggregate —
    map-side partials make the shuffle ≤ m/64 rows per mapper regardless
    of build-side size. Output is at most m/64 rows.
    """
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    if not 1 <= k <= _MAX_K:
        raise ValueError(f"k must be in [1, {_MAX_K}]")
    pos = F.explode(
        F.array(*_positions(_digest(F.col(key_col), seed), k, m_bits))
    ).alias("__pos")
    return (
        # NULL keys never join (semi-join semantics) — and a NULL digest
        # would emit a (word=NULL, bits=NULL) row that crashes the inline
        # probe's bitmap materialization
        keys.filter(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            (F.col("__pos") / 64).cast("long").alias("word"),
            # pyspark's shiftleft only takes a literal shift; the SQL
            # function accepts a column
            F.expr("shiftleft(1L, cast(__pos % 64 AS int))").alias("__m"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(__m)").alias("bits"))
    )


_INLINE_WORDS = 1024  # ≤ 64 Kbit filters inline as a literal array


def bloom_probe(
    fact: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 16,
    k: int = 3,
    seed: str = "bloom",
) -> DataFrame:
    """Keep only fact rows whose key MIGHT be in the filter (all k bits
    set). One md5 per row; then either

    - **inline** (≤ 64 Kbit): the bitmap becomes one ArrayType literal
      and each probe is an array-index bit test inside codegen — no join
      at all. (A literal, NOT ``F.array(*lits)``: CreateArray rebuilds
      the array per row, measured 5× slower; and not beyond 1024 words —
      a 16 K-element literal bloats the generated code past the JIT's
      appetite, measured slower than the joins it replaced.)
    - **broadcast word-table** (larger m): k broadcast hash joins on the
      word index against the ≤ m/64-row bitmap relation + the same bit
      test. Scales to any m a real deployment would size (~10-16 bits
      per build key).

    No false negatives either way: every true match survives — among
    rows with a non-NULL key. A NULL key digests to NULL, makes the
    probe condition NULL, and the row is FILTERED OUT (mirroring
    bloom_build's NULL drop). That is exactly semi-join semantics (NULL
    never equi-joins); callers planning an OUTER join downstream must
    route NULL-key rows around the probe themselves."""
    out = fact.withColumn("__dig", _digest(F.col(key_col), seed))
    for i, pos in enumerate(_positions(F.col("__dig"), k, m_bits)):
        out = out.withColumn(f"__p{i}", pos)
    n_words = m_bits // 64
    drop = ["__dig"] + [f"__p{i}" for i in range(k)]

    if n_words <= _INLINE_WORDS:
        words = [0] * n_words
        for r in bloom.collect():  # ≤ m/64 rows by construction
            words[int(r["word"])] = int(r["bits"])
        out = out.withColumn("__bm", F.lit(words).cast("array<bigint>"))
        cond = F.lit(True)
        for i in range(k):
            # shiftright/& via SQL expr: pyspark's shiftright wants a
            # literal shift amount, the SQL function takes a column
            cond = cond & F.expr(
                f"shiftright(element_at(__bm, cast(__p{i} / 64 AS int) + 1), "
                f"cast(__p{i} % 64 AS int)) & 1 = 1"
            )
        return out.filter(cond).drop("__bm", *drop)

    # materialize the bitmap ONCE (≤ m/64 rows — bounded by config, not
    # data) and rebuild it as a local relation: otherwise each of the k
    # broadcast legs re-runs the whole build aggregate
    rows = bloom.select("word", "bits").collect()
    table = fact.sparkSession.createDataFrame(rows, "word long, bits long")
    cond = F.lit(True)
    for i in range(k):
        w = table.select(
            F.col("word").alias(f"__w{i}"), F.col("bits").alias(f"__b{i}")
        )
        out = out.join(
            F.broadcast(w),
            (F.col(f"__p{i}") / 64).cast("long") == F.col(f"__w{i}"),
            "left",
        )
        cond = cond & F.expr(
            f"shiftright(coalesce(__b{i}, 0L), "
            f"cast(__p{i} % 64 AS int)) & 1 = 1"
        )
        drop += [f"__w{i}", f"__b{i}"]
    return out.filter(cond).drop(*drop)


def bloom_semi_join(
    fact: DataFrame,
    fact_key: str,
    build: DataFrame,
    build_key: str,
    m_bits: int = 1 << 16,
    k: int = 3,
    seed: str = "bloom",
) -> DataFrame:
    """Exact semi-join with a Bloom prefilter: probe the bitmap in the
    fact's scan stage, then run the exact LeftSemi on the survivors. The
    result is IDENTICAL to the plain semi-join (no false negatives); the
    prefilter only cuts the rows that reach the join. The build side
    broadcasts here (selective-dimension contract); swap for a shuffled
    semi when the build side outgrows the broadcast threshold — the
    bitmap stays m bits either way."""
    keys = build.select(build_key)
    bloom = bloom_build(keys, build_key, m_bits, k, seed)
    pruned = bloom_probe(fact, fact_key, bloom, m_bits, k, seed)
    return pruned.join(
        F.broadcast(keys),
        pruned[fact_key] == keys[build_key],
        "semi",
    )
