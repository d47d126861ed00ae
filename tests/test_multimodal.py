"""Multimodal plumbing: schemas, batch shapes, determinism of the stub
decoders, 1→N frame explode, size-binned repartitioning."""

import pytest

from wurzel_spark.operators.multimodal import (
    ASSET_SCHEMA,
    audio_features,
    decode_images,
    repartition_by_size,
    resize_images,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, "image", b"img-one", ("image/png", 32, 24, None, None)),
        (2, "image", b"img-two", ("image/png", 100, 80, None, None)),
        (3, "video", b"vid-one", ("video/mp4", 64, 48, 3500, None)),
        (4, "audio", b"aud-one", ("audio/wav", None, None, 2000, 16000)),
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def test_decode_images_schema_and_determinism(spark, assets):
    out = decode_images(assets).orderBy("asset_id")
    rows1 = out.collect()
    rows2 = decode_images(assets).orderBy("asset_id").collect()
    assert rows1 == rows2  # content-hash-seeded → reproducible
    assert [r["asset_id"] for r in rows1] == [1, 2]
    assert rows1[0]["width"] == 32 and rows1[0]["height"] == 24
    assert rows1[1]["width"] == 64  # capped at 64
    for r in rows1:
        assert 0 <= r["mean_r"] <= 255


def test_resize_keeps_rows_updates_meta(spark, assets):
    out = resize_images(assets, 16, 16).collect()
    assert len(out) == 4
    for r in out:
        assert r["meta"]["width"] == 16 and r["meta"]["height"] == 16
        if r["kind"] == "image":
            assert len(r["content"]) == 16 * 16 * 3


def test_frame_sampling_explodes(spark, assets):
    frames = sample_video_frames(assets, every_ms=1000).collect()
    # 3500ms at 1000ms stride → frames at 0,1000,2000,3000
    assert [f["ts_ms"] for f in frames] == [0, 1000, 2000, 3000]
    assert all(f["asset_id"] == 3 for f in frames)
    assert all(len(f["frame"]) == 16 * 16 * 3 for f in frames)


def test_audio_features(spark, assets):
    rows = audio_features(assets).collect()
    assert len(rows) == 1
    assert rows[0]["duration_ms"] == 2000
    assert rows[0]["rms"] > 0
    assert rows[0]["zero_crossings"] > 0


def test_repartition_by_size_preserves_rows(spark, assets):
    out = repartition_by_size(assets, target_bytes=8)
    assert sorted(r["asset_id"] for r in out.collect()) == [1, 2, 3, 4]
    assert out.schema == assets.schema


def test_image_near_dup_finds_identical_content(spark):
    from wurzel_spark.operators.multimodal import (
        assets_from_documents,
        image_near_dup_pairs,
    )

    # identical text -> identical synthetic asset bytes -> hamming 0
    rows = [
        (0, "same image payload text", "en", "s"),
        (3, "same image payload text", "en", "s"),
        (6, "completely different pixels here", "en", "s"),
    ]  # ids chosen so doc_id % 3 == 0 -> kind 'image'
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    assets = assets_from_documents(docs)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_near_dup_pairs(assets).collect()}
    assert pairs.get((0, 3)) == 0
    assert all(k == (0, 3) for k in pairs)  # the distinct image pairs with no one
