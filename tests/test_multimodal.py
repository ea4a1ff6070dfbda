from __future__ import annotations

import pytest


@pytest.fixture()
def blobs(spark):
    rows = [(1, bytes([10, 20, 30, 40])), (2, bytes(range(60))), (3, b"")]
    return spark.createDataFrame(rows, "media_id LONG, blob BINARY")


def test_extract_image_meta(spark, blobs):
    from aetherium_trader_datapipeline_spark.operators.multimodal import extract_image_meta

    out = {r.media_id: r for r in extract_image_meta(blobs).collect()}
    assert out[1].n_bytes == 4 and out[1].width == 11 and out[1].height == 41
    assert out[3].format == "empty"
    # deterministic: second run identical
    again = {r.media_id: r for r in extract_image_meta(blobs).collect()}
    assert {k: (v.width, v.height, v.format) for k, v in out.items()} == {
        k: (v.width, v.height, v.format) for k, v in again.items()
    }


def test_decode_image_stub_raises(spark):
    from aetherium_trader_datapipeline_spark.operators.multimodal import decode_image, _HAS_PIL

    if _HAS_PIL:
        pytest.skip("PIL present; stub not active")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_frame_sample_plan(spark):
    from aetherium_trader_datapipeline_spark.operators.multimodal import frame_sample_plan

    vids = spark.createDataFrame([(1, 3.0), (2, 0.2)], "vid LONG, duration_s DOUBLE")
    out = frame_sample_plan(vids, fps=2.0).collect()
    per_vid = {}
    for r in out:
        per_vid.setdefault(r.vid, []).append(r.frame_idx)
    assert sorted(per_vid[1]) == [0, 1, 2, 3, 4, 5]  # 3s @ 2fps
    assert sorted(per_vid[2]) == [0]  # short clip → at least 1 frame


def test_embed_blobs_feeds_similarity(spark, blobs):
    """The fake embeddings flow through the real similarity operator —
    proving the multimodal → vector-ops plumbing end-to-end."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import embed_blobs
    from aetherium_trader_datapipeline_spark.operators.similarity import pairwise_cosine_topk

    emb = embed_blobs(blobs, dim=8).select("media_id", "embedding")
    top = pairwise_cosine_topk(emb, "media_id", "embedding", k=3).collect()
    assert len(top) == 3
    assert all(-1.0 <= r.sim <= 1.0 for r in top)
