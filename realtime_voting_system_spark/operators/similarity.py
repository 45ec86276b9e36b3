"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``  — exact brute-force top-k (the baseline / verifier)
- ``ann_lsh_topk`` — random-hyperplane LSH bucketed approximate top-k
                     (the 100 TB path; recall measured against brute force
                     in tests/test_similarity.py)

Vector math is built-in HOFs (functions/vectors.py) — JVM-side, no UDFs:
at 64-dim the zip_with/aggregate chain stays in codegen and beats Arrow
round-trips for this shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine, dot


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (desc), ties broken by
    neighbor id — fully deterministic output.

    Scale: broadcast the QUERY side (top-k lookups are few), stream the
    corpus — one pass, no corpus shuffle for scoring; the only shuffle is
    the per-query top-k aggregation, whose input is k-prunable map-side
    (partial top-k per partition would be the next refinement; the window
    over (query × corpus-partition-survivors) is bounded by #queries × k
    after AQE partial aggregation).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes (seeded LCG — no numpy
    RNG state, reproducible across runs/machines)."""
    planes, state = [], seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(1.0 if (state >> 32) & 1 else -1.0)
        planes.append(row)
    return planes


def lsh_signature(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    out: str = "bucket",
) -> DataFrame:
    """Random-hyperplane signature: bit_j = (v · h_j > 0); bucket = packed
    bits. Cosine-similar vectors collide with prob 1 − θ/π per bit."""
    planes = _hyperplanes(dim, n_planes, seed)
    v = as_double(F.col(vec_col))
    bits = [
        F.when(dot(v, F.array(*[F.lit(x) for x in p])) > 0, F.lit(1 << j)).otherwise(0)
        for j, p in enumerate(planes)
    ]
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return df.withColumn(out, bucket.cast("long"))


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: multi-table hyperplane LSH; candidates = corpus
    vectors sharing a bucket with the query in ANY table; exact cosine +
    top-k within candidates.

    Scale: scoring touches only bucket-mates (expected corpus/2^planes per
    table), joined on (table, bucket) — a key-partitioned equi-join instead
    of the brute-force cross join. Recall tunes with n_tables (see
    tests/test_similarity.py). An IVF variant would replace the hash with
    learned centroids; the plumbing (bucket join → rescore) is identical.
    """
    def sig_tables(df: DataFrame, prefix: str) -> DataFrame:
        out = df
        for t in range(n_tables):
            out = lsh_signature(out, vec_col, dim, n_planes, seed=42 + t, out=f"b{t}")
        return out.select(
            F.col(id_col).alias(f"{prefix}_id"),
            as_double(F.col(vec_col)).alias(f"{prefix}v"),
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(t).alias("tbl"), F.col(f"b{t}").alias("bucket"))
                        for t in range(n_tables)
                    ]
                )
            ).alias("tb"),
        ).select(f"{prefix}_id", f"{prefix}v", "tb.tbl", "tb.bucket")

    q = F.broadcast(sig_tables(queries, "query"))
    c = sig_tables(corpus, "neighbor")
    cands = (
        q.join(c, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "queryv", "neighbor_id", "neighborv")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        cands.select(
            "query_id",
            "neighbor_id",
            cosine(F.col("queryv"), F.col("neighborv")).alias("cos_sim"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )
