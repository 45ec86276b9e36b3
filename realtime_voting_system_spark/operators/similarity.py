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


def lsh_bucket_expr(
    v: "F.Column", dim: int, n_planes: int = 16, seed: int = 42
) -> "F.Column":
    """Packed sign-bit bucket over an array<double> vector expression:
    bit_j = (v · h_j > 0); bucket = Σ bit_j · 2^j. The dot is the
    sequential-fold HOF (functions/vectors.py), so the sign — and hence
    the bucket — bit-matches any engine evaluating the same plane literals
    in index order (DuckDB list_dot_product; the oracle twins rely on it)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = None
    for j, p in enumerate(planes):
        bit = F.when(
            dot(v, F.array(*[F.lit(x) for x in p])) > 0, F.lit(1 << j)
        ).otherwise(0)
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


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
    return df.withColumn(
        out, lsh_bucket_expr(as_double(F.col(vec_col)), dim, n_planes, seed)
    )


def _sig_tables_pandas(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    prefix: str,
    dim: int,
    n_planes: int,
    n_tables: int,
    seed0: int = 42,
) -> DataFrame:
    """(id, vector, tbl, bucket) rows for all LSH tables in ONE Arrow pass.

    All n_tables × n_planes sign bits come from a single numpy matmul per
    batch — the per-plane HOF dot (aggregate∘zip_with) is interpreted, not
    codegen'd, and evaluating it 48× per row dominated ann runtime (6.1 s →
    sub-second at sf0.1). Bit semantics identical to ``lsh_signature``:
    bit_j = (v · h_j > 0), bucket = Σ bit_j · 2^j per table.
    """
    import numpy as np

    planes = np.concatenate(
        [
            np.asarray(_hyperplanes(dim, n_planes, seed0 + t), dtype=np.float64)
            for t in range(n_tables)
        ],
        axis=0,
    )  # (n_tables·n_planes, dim)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            vm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (vm @ planes.T) > 0  # (batch, n_tables·n_planes)
            vecs = list(vm)
            frames = []
            for t in range(n_tables):
                buckets = (
                    bits[:, t * n_planes : (t + 1) * n_planes].astype(np.int64)
                    @ weights
                )
                frames.append(
                    pd.DataFrame(
                        {
                            f"{prefix}_id": ids,
                            f"{prefix}v": vecs,
                            "tbl": t,
                            "bucket": buckets,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return df.select(id_col, vec_col).mapInPandas(
        gen, f"{prefix}_id long, {prefix}v array<double>, tbl int, bucket long"
    )


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
    Signatures are computed batch-vectorized (_sig_tables_pandas); the
    rescore stays JVM-side HOF so scores bit-match cosine_topk's.
    """
    q = F.broadcast(
        _sig_tables_pandas(queries, id_col, vec_col, "query", dim, n_planes, n_tables)
    )
    c = _sig_tables_pandas(corpus, id_col, vec_col, "neighbor", dim, n_planes, n_tables)
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the learned-partition scale path
# ---------------------------------------------------------------------------


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 2,
) -> DataFrame:
    """(centroid_id, cv) — k-means-style centroids, fully deterministic.

    Seeding: the ``n_centroids`` corpus vectors with the smallest
    xxhash64(id) (a reproducible pseudo-random sample, no RNG state).
    Refinement: ``iters`` Lloyd steps; the element-wise mean is computed
    distributed via posexplode → groupBy(centroid, dim) → avg → re-assemble
    (sorted struct collect), so no vector ever reaches the driver.

    Scale: assignment is corpus × K with the K centroids broadcast — one
    narrow pass per iteration; the mean shuffle is (K × dim) cells.
    """
    v = corpus.select(
        F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("vv")
    )
    cents = (
        v.withColumn("h", F.xxhash64(F.col("vid").cast("string")))
        .orderBy("h", "vid")
        .limit(n_centroids)
        .select(
            F.row_number()
            .over(Window.orderBy("h", "vid"))
            .cast("long")
            .alias("centroid_id"),
            F.col("vv").alias("cv"),
        )
    )
    for _ in range(iters):
        assigned = _assign_cells(v, cents, "vid", "vv")
        cents = (
            assigned.select(
                "centroid_id", F.posexplode("vv").alias("pos", "x")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.m,
                ).alias("cv")
            )
        )
    return cents


def _assign_cells(
    v: DataFrame, cents: DataFrame, id_name: str, vec_name: str, n: int = 1
) -> DataFrame:
    """Nearest-``n`` centroids per vector by cosine (ties → centroid_id).

    The centroid table is K rows by contract (K ≪ corpus) — collected to
    the driver and shipped in the UDF closure, the same broadcast shape a
    real cluster uses. Scoring is one numpy matmul per Arrow batch instead
    of a crossJoin with K interpreted HOF cosines per vector (the previous
    plan; ~4× slower at sf0.1). Stable argsort over (−sim) with centroids
    pre-sorted by id keeps the tie rule: equal sims → smaller centroid_id.
    """
    import numpy as np

    rows = cents.collect()
    order = sorted(range(len(rows)), key=lambda i: rows[i]["centroid_id"])
    cids = np.array([rows[i]["centroid_id"] for i in order], dtype=np.int64)
    cm = np.stack(
        [np.asarray(rows[i]["cv"], dtype=np.float64) for i in order]
    )
    cn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    take = min(n, len(cids))

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_name].to_numpy()
            vm = np.stack(pdf[vec_name].to_numpy()).astype(np.float64)
            vn = vm / np.linalg.norm(vm, axis=1, keepdims=True)
            sims = vn @ cn.T  # (batch, K)
            nearest = np.argsort(-sims, axis=1, kind="stable")[:, :take]
            vecs = list(vm)
            yield pd.DataFrame(
                {
                    id_name: np.repeat(ids, take),
                    vec_name: [v for v in vecs for _ in range(take)],
                    "centroid_id": cids[nearest].ravel(),
                }
            )

    return v.select(id_name, vec_name).mapInPandas(
        gen, f"{id_name} long, {vec_name} array<double>, centroid_id long"
    )


def ann_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 2,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their nearest-centroid
    cell; a query probes its ``nprobe`` nearest cells and rescores exactly
    within them. ``nprobe == n_centroids`` degenerates to exact brute force
    (asserted in tests — the correctness anchor for the approximation).

    Scale: the inverted file is a (cell → vectors) partitioning; probing is
    a broadcast-query equi-join on cell. Expected scored fraction =
    nprobe/n_centroids of the corpus (uniform cells), vs LSH's bucket
    collision mass — IVF adapts to the data's cluster structure, LSH does
    not need training. Same plumbing either way: bucket join → rescore.
    """
    cents = ivf_centroids(corpus, id_col, vec_col, n_centroids, iters)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("neighborv"),
    )
    inverted = _assign_cells(c, cents, "neighbor_id", "neighborv")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("queryv"),
    )
    probes = _assign_cells(q, cents, "query_id", "queryv", n=nprobe)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        F.broadcast(probes).join(inverted, "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("queryv"), F.col("neighborv")).alias("cos_sim"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


# ---------------------------------------------------------------------------
# Vectorized (Arrow/numpy) brute-force — the wide-vector path
# ---------------------------------------------------------------------------


def cosine_topk_pandas(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k via mapInPandas + numpy matmul — same semantics as
    ``cosine_topk`` with two scale upgrades:

    - scoring is one BLAS matmul per Arrow batch instead of per-row HOF
      eval (wins for dim ≳ 256 where JVM zip_with costs dominate);
    - each batch emits only its LOCAL top-k per query (argpartition), so
      the global window sees #batches × #queries × k rows, not
      #corpus × #queries — the map-side top-k combine.

    The query set is collected to the driver and shipped in the UDF
    closure (top-k lookups are few by contract; the corpus never moves).
    Scores may differ from the HOF path in the last ulp (BLAS pairwise
    summation vs sequential) — identical neighbor SETS, not bit-identical
    doubles; callers needing the oracle-matched path use cosine_topk.
    Ids are emitted as long (the testdata contract).
    """
    import numpy as np

    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qm = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            nids = pdf[id_col].to_numpy(dtype=np.int64)
            cm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cn @ qn.T  # (batch, n_queries)
            sims[nids[:, None] == qids[None, :]] = -np.inf  # self-matches
            kk = min(k, sims.shape[0])
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # per query
            out_q, out_n, out_s = [], [], []
            for j in range(sims.shape[1]):
                rows = top[:, j]
                out_q.extend([qids[j]] * len(rows))
                out_n.extend(nids[rows])
                out_s.extend(sims[rows, j])
            res = pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
            )
            yield res[res.cos_sim != -np.inf]

    partials = corpus.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        partials.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )
