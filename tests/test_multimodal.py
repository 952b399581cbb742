"""Multimodal stage tests: schema, decode dialect, resize, frame sampling,
actor-pool plumbing, codec-gap stub behavior."""

import numpy as np
import pyarrow as pa
import pytest

from ocr_ray.stages import multimodal as mm


def test_synth_media_schema_and_determinism():
    t1, t2 = mm.synth_media(12), mm.synth_media(12)
    assert t1.schema.equals(mm.MEDIA)
    assert t1.equals(t2)
    kinds = set(t1.column("kind").to_pylist())
    assert kinds == {"image", "audio", "video"}


def test_decode_roundtrip():
    t = mm.synth_media(6)
    for row in t.to_pylist():
        arr = mm.decode_media(row["payload"])
        if row["kind"] == "image":
            assert arr.shape == (row["height"], row["width"], 3)
            assert arr.dtype == np.uint8
        elif row["kind"] == "audio":
            assert arr.dtype == np.int16
        else:
            assert arr.shape[0] == row["n_frames"]


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError, match="PIL|codec"):
        mm.decode_media(b"\x89PNG\r\n\x1a\nxxxx")


def test_resize_media():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = mm.resize_media(img, 4, 4)
    assert out.shape == (4, 4)
    assert out[0, 0] == img[0, 0]
    up = mm.resize_media(img, 16, 16)
    assert up.shape == (16, 16)


def test_sample_frames():
    video = np.arange(10 * 2 * 2, dtype=np.uint8).reshape(10, 2, 2)
    out = mm.sample_frames(video, 3)
    assert out.shape == (3, 2, 2)
    assert (out[0] == video[0]).all() and (out[-1] == video[-1]).all()
    assert mm.sample_frames(video, 99).shape[0] == 10


def test_feature_extractor_batch():
    ex = mm.MediaFeatureExtractor()
    t = mm.synth_media(9)
    out = ex(t)
    assert out.schema.equals(mm.FEATURES)
    assert out.num_rows == 9
    assert all(s == "ok" for s in out.column("status").to_pylist())
    assert all(sum(h) > 0 for h in out.column("histogram").to_pylist())


def test_feature_extractor_error_rows():
    bad = pa.Table.from_pylist(
        [
            {"media_id": 0, "kind": "image", "payload": b"\x89PNGgarbage",
             "width": 0, "height": 0, "sample_rate": 0, "n_frames": 0},
            {"media_id": 1, "kind": "image", "payload": b"IMG1\x00",
             "width": 0, "height": 0, "sample_rate": 0, "n_frames": 0},
        ],
        schema=mm.MEDIA,
    )
    out = mm.MediaFeatureExtractor()(bad)
    assert out.column("status").to_pylist() == ["error", "error"]


def test_media_pipeline_ray(ray_session):
    import ray.data

    media = ray.data.from_arrow(mm.synth_media(24)).repartition(4)
    out = mm.media_features(media, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 24
    assert (out["status"] == "ok").all()
    # determinism across runs
    out2 = mm.media_features(
        ray.data.from_arrow(mm.synth_media(24)).repartition(4),
        concurrency=2, batch_size=8,
    ).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert a.equals(b)
