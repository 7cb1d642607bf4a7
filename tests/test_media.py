"""Multimodal binary-column plumbing: schema, batch shape, error channel."""

from __future__ import annotations

import hashlib

import pytest

from mmkg_rag_spark.operators import ann, media


@pytest.fixture(scope="module")
def spark():
    from mmkg_rag_spark.session import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8, app_name="pytest-med")


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (0, "u0", "image", b"payload-zero-" * 100, {"src": "crawl"}),
        (1, "u1", "image", b"payload-one-" * 2000, {}),
        (2, "u2", "image", b"!bad corrupt bytes", {}),
        (3, "u3", "video", b"video-bytes-" * 500, {}),
        (4, "u4", "image", b"payload-zero-" * 100, {}),  # exact dup of 0
    ]
    return spark.createDataFrame(rows, media.MEDIA_SCHEMA)


def test_decode_error_channel(media_df):
    out = {r.media_id: r for r in media.decode_images(media_df).collect()}
    assert out[0].decode_ok and out[0].width >= 64 and out[0].channels == 3
    assert not out[2].decode_ok and "corrupt" in out[2].decode_error
    assert out[0].width == out[4].width  # deterministic per content
    assert len(out) == 5  # bad rows kept, never dropped silently


def test_resize_drops_bad_and_scales(media_df):
    out = {r.media_id: r for r in media.resize_images(media_df, max_side=128).collect()}
    assert 2 not in out  # undecodable dropped here (decode_images keeps them)
    assert max(out[0].thumb_width, out[0].thumb_height) <= 128
    assert bytes(out[0].thumb) == hashlib.sha256(b"payload-zero-" * 100).digest()


def test_embed_feeds_ann(media_df, spark):
    emb = media.embed_images(media_df)
    rows = emb.collect()
    assert all(len(r.embedding) == media.EMBED_DIM for r in rows)
    # dup payloads → identical embeddings; ANN finds the planted duplicate
    q = emb.filter("media_id = 0").selectExpr(
        "media_id as query_id", "embedding as query_vec"
    )
    top = ann.brute_topk_cosine(
        emb, q, k=1, id_col="media_id", vec_col="embedding"
    ).collect()
    assert top[0].nn_id == 4 and top[0].score == 1.0


def test_frame_sampling_fanout(media_df):
    frames = media.sample_frames(media_df, every_ms=1000, max_frames=8).collect()
    assert frames and all(r.media_id == 3 for r in frames)
    idx = sorted(r.frame_index for r in frames)
    assert idx == list(range(len(idx)))
    assert all(r.ts_ms == r.frame_index * 1000 for r in frames)
    # deterministic frame payloads
    assert len({bytes(r.frame) for r in frames}) == len(frames)


def test_balance_by_bytes(media_df):
    out = media.balance_by_bytes(media_df, target_partition_bytes=10_000)
    assert out.rdd.getNumPartitions() >= 2
    assert out.count() == 5
