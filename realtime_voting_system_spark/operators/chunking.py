"""Document chunking and sequence packing — the tokenize→chunk→pack stage
that turns a curated corpus into fixed-budget training sequences.

The reference has no chunking surface (its texts are short SQL strings);
this is beyond-reference training-data machinery (SURVEY §2.11), built the
Spark-first way:

- ``chunk_tokens``  — overlapping token-window chunks via explode(sequence)
  + slice on a materialized token array: a generator in the scan stage,
  zero shuffle, output rows ≈ Σ ceil(n_tokens/stride).
- ``pack_chunks``   — concat-and-split packing into token-budget bins,
  WITHIN deterministic hash buckets: each bucket is an independent packing
  stream (one window partition), so parallelism is ``n_buckets`` writer
  tasks at any corpus size — never a global single-partition sort.

Determinism contract: chunk boundaries are pure integer arithmetic on the
shared tokenizer (functions/text.tokens); pack assignment is integer
running sums under a total order (doc_id, chunk_id) inside an md5-derived
bucket — reproducible across re-runs, retries, and repartitioning, and
mirrored exactly by the DuckDB oracles in plans/scale_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split each document into overlapping token-window chunks.

    Chunk ``i`` (0-based) covers tokens ``[i*stride, i*stride + window)``;
    starts run while ``i*stride < n_tokens``, so the final chunk may be
    short (it is never empty) and with ``stride < window`` consecutive
    chunks overlap by ``window - stride`` tokens — the standard context-
    window slicing for LLM pretraining. Zero-token documents produce no
    chunks.

    Returns (id, chunk_id, chunk_text, n_chunk_tokens).

    Scale: the token array is materialized ONCE per row (no O(n²)
    re-tokenization — see functions/text.word_ngrams' trap note), then
    explode(sequence) fans out in the same stage as the scan; no shuffle
    anywhere. At 100 TB this rides the scan exactly like rebalance_epochs.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toked = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") > 0)
    n = F.size("toks")
    last = F.floor((n - F.lit(1)) / F.lit(stride)).cast("int")
    start = (F.col("chunk_id") * stride).cast("int")
    return (
        toked.select(
            id_col,
            "toks",
            F.explode(F.sequence(F.lit(0), last)).alias("chunk_id"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.concat_ws(" ", F.slice("toks", start + 1, F.lit(window))).alias(
                "chunk_text"
            ),
            F.least(F.lit(window), F.size("toks") - start)
            .cast("long")
            .alias("n_chunk_tokens"),
        )
    )


def pack_chunks(
    chunks: DataFrame,
    budget: int = 256,
    n_buckets: int = 8,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tok_col: str = "n_chunk_tokens",
    salt: str = "pack",
) -> DataFrame:
    """Assign chunks to fixed-token-budget packs (concat-and-split).

    Each document hashes to one of ``n_buckets`` packing streams; within a
    stream, chunks are laid end-to-end in (doc, chunk) order and cut every
    ``budget`` tokens. A chunk's pack is where its FIRST token lands:
    ``pack_id = floor(tokens_before / budget)``, ``pack_pos`` its token
    offset within the pack, ``straddles`` whether it crosses into the next
    pack (the consumer's split-or-roll decision point).

    Scale: the only shuffle is one hash partition on ``bucket`` — the
    window sort is per-bucket, and n_buckets is chosen ≈ writer-task count,
    so no global ordering bottleneck exists at any corpus size (this is
    how distributed sequence packing actually runs: one packer per shard).
    Assignment is a pure function of (salt, doc_id, chunk layout) —
    restarts and retries repack identically.
    """
    bucket = (
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
        % n_buckets
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col, chunk_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_prev = F.coalesce(F.sum(tok_col).over(w), F.lit(0).cast("long"))
    out = chunks.withColumn("bucket", bucket).withColumn(
        "__cum_prev", cum_prev
    )
    pack_id = F.floor(F.col("__cum_prev") / budget).cast("long")
    return out.select(
        id_col,
        chunk_col,
        tok_col,
        "bucket",
        pack_id.alias("pack_id"),
        (F.col("__cum_prev") % budget).cast("long").alias("pack_pos"),
        (
            F.floor((F.col("__cum_prev") + F.col(tok_col) - 1) / budget).cast(
                "long"
            )
            > pack_id
        ).alias("straddles"),
    )


def packing_efficiency(
    packed: DataFrame,
    budget: int,
    bucket_col: str = "bucket",
    tok_col: str = "n_chunk_tokens",
    straddle_col: str = "straddles",
) -> DataFrame:
    """Packing-quality report over ``pack_chunks`` output: per bucket,
    chunk/token totals, pack count (= ceil(tokens/budget) — concat-and-
    split never leaves a hole except the tail), full packs, tail size,
    straddler count (chunks crossing a pack boundary), fragment count
    (chunks + one extra piece per straddler; holds while every chunk ≤
    budget — a chunk longer than the budget splits more than once and
    ``pack_chunks``'s single straddle flag undercounts, so feed chunked
    input), waste tokens (padding the tail pack), and utilization
    (tokens / (packs·budget), ONE final double division).

    Scale: one groupBy on the bucket key the packer already shuffled
    on; the report is n_buckets rows. All-integer until utilization.
    """
    g = packed.groupBy(bucket_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(tok_col).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col(straddle_col), 1).otherwise(0))
        .cast("long")
        .alias("n_straddlers"),
    )
    n_packs = F.expr(f"(n_tokens + {budget - 1}) div {budget}").cast("long")
    return g.select(
        bucket_col,
        "n_chunks",
        "n_tokens",
        n_packs.alias("n_packs"),
        F.expr(f"n_tokens div {budget}").cast("long").alias("n_full_packs"),
        (F.col("n_tokens") % budget).cast("long").alias("tail_tokens"),
        "n_straddlers",
        (F.col("n_chunks") + F.col("n_straddlers"))
        .cast("long")
        .alias("n_fragments"),
        (n_packs * budget - F.col("n_tokens"))
        .cast("long")
        .alias("waste_tokens"),
        (
            F.col("n_tokens").cast("double")
            / (n_packs.cast("double") * F.lit(float(budget)))
        ).alias("utilization"),
    )
