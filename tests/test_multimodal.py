"""Multimodal plumbing tests: the decode is a stub, the Spark mechanics
(binary schema, Arrow batching, 1→N fan-out, payload pruning) are real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_voting_system_spark.operators import multimodal


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return multimodal.with_binary_payload(docs)


def test_payload_is_binary_and_roundtrips(spark, assets):
    f = dict(zip(assets.schema.names, [x.dataType.simpleString() for x in assets.schema.fields]))
    assert f["payload"] == "binary"
    row = assets.join(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "doc_id"
    ).select("payload", "text").first()
    assert bytes(row.payload).decode("utf-8") == row.text


def test_meta_extraction_schema_and_coverage(spark, assets):
    meta = multimodal.extract_asset_meta(assets)
    assert meta.schema == multimodal.ASSET_META
    assert meta.count() == assets.count()
    mods = {r.modality for r in meta.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}


def test_frame_sample_fanout(spark, assets):
    frames = multimodal.frame_sample(assets, every_n=10)
    per_doc = frames.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("frame_idx").alias("mx")
    )
    meta = multimodal.extract_asset_meta(assets).filter("modality = 'video'")
    joined = per_doc.join(meta, "doc_id").collect()
    assert joined
    for r in joined:
        assert r.n == (r.n_frames + 9) // 10  # ceil(n_frames / every_n)
        assert r.mx <= r.n_frames


def test_resize_preserves_contract(spark, assets):
    out = multimodal.resize_images(assets, max_side=128)
    assert out.schema == multimodal.ASSET_SCHEMA
    assert out.count() == assets.filter("modality = 'image'").count()
