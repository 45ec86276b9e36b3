"""DedupIndex — the unified save/load/probe/absorb surface over the three
persisted-index dedup operators. Contract per kind: probe ≡ the direct
operator, save→load is lossless, absorb admits only kept rows and makes
them duplicates on re-probe (append-not-rebuild)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_voting_system_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_exact_index_probe_matches_operator(spark, docs, tmp_path):
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    idx = dedup.DedupIndex.build(corpus, "exact")
    direct = dedup.incremental_dedup(
        batch,
        corpus.select(F.md5(
            __import__(
                "realtime_voting_system_spark.functions.text",
                fromlist=["normalize"],
            ).normalize(F.col("text"))
        ).alias("fingerprint")),
    )
    assert _rows(idx.probe(batch)) == _rows(direct)
    idx.save(str(tmp_path / "exact_idx"))
    loaded = dedup.DedupIndex.load(spark, str(tmp_path / "exact_idx"))
    assert loaded.kind == "exact" and loaded.params == idx.params
    assert _rows(loaded.probe(batch)) == _rows(direct)


def test_minhash_index_probe_matches_operator(spark, docs, tmp_path):
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    idx = dedup.DedupIndex.build(corpus, "minhash")
    direct = dedup.incremental_minhash_dedup(batch, corpus)
    assert _rows(idx.probe(batch)) == _rows(direct)
    idx.save(str(tmp_path / "mh_idx"))
    loaded = dedup.DedupIndex.load(spark, str(tmp_path / "mh_idx"))
    assert _rows(loaded.probe(batch)) == _rows(direct)


def test_semantic_index_probe_matches_operator(spark, emb, tmp_path):
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    idx = dedup.DedupIndex.build(
        corpus, "semantic", threshold=0.30, iters=0, hash_fn="md5",
        assign="fold",
    )
    cents = similarity.ivf_centroids(
        corpus, n_centroids=16, iters=0, hash_fn="md5"
    )
    direct = dedup.incremental_semantic_dedup(
        batch, cents, similarity.assign_cells(
            corpus, cents, assign="fold"
        ), corpus, threshold=0.30, assign="fold",
    )
    assert _rows(idx.probe(batch)) == _rows(direct)
    idx.save(str(tmp_path / "sem_idx"))
    loaded = dedup.DedupIndex.load(spark, str(tmp_path / "sem_idx"))
    assert _rows(loaded.probe(batch)) == _rows(direct)


@pytest.mark.parametrize("kind", ["exact", "minhash"])
def test_absorb_makes_kept_rows_duplicates(spark, docs, tmp_path, kind):
    """The append-not-rebuild restart contract: after absorbing a batch,
    a SAVED+RELOADED index must flag that same batch's kept rows as
    duplicates of the index."""
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") < 60))
    idx = dedup.DedupIndex.build(corpus, kind)
    st1 = idx.probe(batch)
    kept1 = {r[0] for r in st1.collect() if r["status"] == "kept"}
    assert kept1  # fixture sanity: some of the batch is novel
    idx2 = idx.absorb(batch, st1)
    idx2.save(str(tmp_path / f"absorbed_{kind}"))
    loaded = dedup.DedupIndex.load(
        spark, str(tmp_path / f"absorbed_{kind}")
    )
    st2 = loaded.probe(batch)
    for r in st2.collect():
        if r[0] in kept1:
            assert r["status"] != "kept", (kind, r)


def test_absorb_semantic_freezes_centroids(spark, emb):
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 80))
    idx = dedup.DedupIndex.build(
        corpus, "semantic", threshold=0.95, iters=0, hash_fn="md5",
        assign="fold",
    )
    idx2 = idx.absorb(batch)
    # train-once contract: the centroid artifact is the same object/rows
    assert _rows(idx2.arts["centroids"]) == _rows(idx.arts["centroids"])
    # kept batch rows joined the assignment and vector tables
    n_kept = idx2.arts["assign"].count() - idx.arts["assign"].count()
    assert n_kept > 0
    assert (
        idx2.arts["vectors"].count() - idx.arts["vectors"].count() == n_kept
    )
    # re-probe: a vector identical to an absorbed one is a near-dup now
    st = idx2.probe(batch)
    kept = st.filter(F.col("status") == "kept").count()
    assert kept == 0  # every batch row now collides with itself in index


def test_unknown_kind_rejected(spark, docs):
    with pytest.raises(ValueError, match="unknown index kind"):
        dedup.DedupIndex.build(docs, "bloom")
    with pytest.raises(ValueError, match="missing artifacts"):
        dedup.DedupIndex("minhash", {}, {"bands": docs})
