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


def test_decode_real_unknown_codec_fails_fast():
    # PNG/BMP/WAV/JPEG decode for real now (ocr_ray.codecs, ocr_ray.jpeg);
    # an unknown container (e.g. video) still states the codec gap
    with pytest.raises(NotImplementedError, match="codec"):
        mm.decode_media(b"\x00\x00\x00\x18ftypmp42 video payload")


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


def test_png_roundtrip_all_colortypes():
    import numpy as np

    from ocr_ray import codecs

    rng = np.random.RandomState(31)
    for shape in ((7, 5), (7, 5, 2), (6, 9, 3), (4, 4, 4)):
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        back = codecs.decode_png(codecs.encode_png(img))
        assert back.shape == img.shape
        assert (back == img).all()


def test_png_filters_decode():
    """Hand-built PNG using Sub/Up filters decodes to the right pixels."""
    import struct as st
    import zlib

    import numpy as np

    from ocr_ray import codecs

    w, h, ch = 4, 2, 1
    # row0 filter 1 (Sub): raw deltas 10,5,5,5 -> recon 10,15,20,25
    # row1 filter 2 (Up):  raw deltas 1,1,1,1  -> recon 11,16,21,26
    raw = b"\x01" + bytes([10, 5, 5, 5]) + b"\x02" + bytes([1, 1, 1, 1])

    def chunk(t, d):
        return st.pack(">I", len(d)) + t + d + st.pack(">I", zlib.crc32(t + d))

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", st.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    img = codecs.decode_png(payload)
    assert img.tolist() == [[10, 15, 20, 25], [11, 16, 21, 26]]


def test_bmp_wav_roundtrip():
    import numpy as np

    from ocr_ray import codecs

    rng = np.random.RandomState(33)
    img = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert (codecs.decode_bmp(codecs.encode_bmp(img)) == img).all()

    pcm = rng.randint(-32768, 32767, size=300, dtype=np.int16)
    back, sr = codecs.decode_wav(codecs.encode_wav(pcm, 16000))
    assert sr == 16000 and (back == pcm).all()
    stereo = rng.randint(-32768, 32767, size=(100, 2), dtype=np.int16)
    back2, _ = codecs.decode_wav(codecs.encode_wav(stereo, 8000))
    assert back2.shape == (100, 2) and (back2 == stereo).all()


def test_decode_real_dispatch_and_gap():
    import numpy as np
    import pytest

    from ocr_ray import codecs
    from ocr_ray.stages.multimodal import decode_real

    img = np.zeros((3, 3, 3), dtype=np.uint8)
    assert decode_real(codecs.encode_png(img)).shape == (3, 3, 3)
    assert decode_real(codecs.encode_bmp(img)).shape == (3, 3, 3)
    assert decode_real(codecs.encode_wav(np.zeros(10, dtype=np.int16), 8000)).shape == (10,)
    from ocr_ray import jpeg

    assert decode_real(jpeg.encode_jpeg(img)).shape == (3, 3, 3)
    with pytest.raises(ValueError):
        decode_real(b"\xff\xd8\xff\xe0 jpeg-ish")  # truncated JPEG: hard error
    with pytest.raises(NotImplementedError, match="codec"):
        decode_real(b"\x00\x00\x00\x18ftypmp42")  # video: stated gap


def test_media_features_on_real_codecs(ray_session):
    """PNG/BMP/WAV payloads flow through the actor-pool feature stage."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ocr_ray import codecs
    from ocr_ray.stages.multimodal import MEDIA, media_features

    rng = np.random.RandomState(37)
    rows = []
    for i, kind in enumerate(("image", "image", "audio")):
        if i == 0:
            payload = codecs.encode_png(rng.randint(0, 256, (8, 8, 3), dtype=np.uint8))
        elif i == 1:
            payload = codecs.encode_bmp(rng.randint(0, 256, (6, 6, 3), dtype=np.uint8))
        else:
            payload = codecs.encode_wav(
                rng.randint(-32768, 32767, 200, dtype=np.int16), 16000
            )
        rows.append(
            {"media_id": i, "kind": kind, "payload": payload, "width": 0,
             "height": 0, "sample_rate": 0, "n_frames": 0}
        )
    out = media_features(
        ray.data.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA))
    ).to_pandas()
    assert list(out["status"]) == ["ok"] * 3
    assert (out["n_bytes"] > 0).all()


def _png_chunk(t, d):
    import struct as st
    import zlib

    return st.pack(">I", len(d)) + t + d + st.pack(">I", zlib.crc32(t + d))


def _build_png(w, h, depth, color_type, raw_scanlines, extra_chunks=(), interlace=0):
    import struct as st
    import zlib

    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", st.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    )
    for c in extra_chunks:
        out += c
    out += _png_chunk(b"IDAT", zlib.compress(raw_scanlines)) + _png_chunk(b"IEND", b"")
    return out


def test_png_palette_decode():
    import numpy as np

    from ocr_ray import codecs

    # 4x2 palette-8 image over a 3-color palette
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = b"\x00" + bytes([0, 1, 2, 1]) + b"\x00" + bytes([2, 2, 0, 0])
    payload = _build_png(4, 2, 8, 3, raw, extra_chunks=[_png_chunk(b"PLTE", palette)])
    img = codecs.decode_png(payload)
    assert img.shape == (2, 4, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 2].tolist() == [0, 0, 255]
    assert img[1, 3].tolist() == [255, 0, 0]

    # with tRNS -> RGBA, entry 0 transparent
    payload = _build_png(
        4, 2, 8, 3, raw,
        extra_chunks=[_png_chunk(b"PLTE", palette), _png_chunk(b"tRNS", bytes([0]))],
    )
    rgba = codecs.decode_png(payload)
    assert rgba.shape == (2, 4, 4)
    assert rgba[0, 0, 3] == 0 and rgba[0, 1, 3] == 255


def test_png_subbyte_gray_decode():
    from ocr_ray import codecs

    # 1-bit gray, 10 px wide (2 bytes per row, MSB first): 1010101010 / 0101010101
    raw = b"\x00" + bytes([0b10101010, 0b10000000]) + b"\x00" + bytes([0b01010101, 0b01000000])
    img = codecs.decode_png(_build_png(10, 2, 1, 0, raw))
    assert img.shape == (2, 10)
    assert img[0].tolist() == [255, 0] * 5
    assert img[1].tolist() == [0, 255] * 5

    # 4-bit gray, 3 px wide: values 0,8,15 -> scaled x17 = 0,136,255
    raw4 = b"\x00" + bytes([0x08, 0xF0])
    img4 = codecs.decode_png(_build_png(3, 1, 4, 0, raw4))
    assert img4[0].tolist() == [0, 136, 255]

    # 2-bit palette
    palette = bytes([10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40])
    raw2 = b"\x00" + bytes([0b00011011])  # indices 0,1,2,3
    p = codecs.decode_png(
        _build_png(4, 1, 2, 3, raw2, extra_chunks=[_png_chunk(b"PLTE", palette)])
    )
    assert p[0].tolist() == [[10] * 3, [20] * 3, [30] * 3, [40] * 3]


def test_png_16bit_decode():
    import numpy as np

    from ocr_ray import codecs

    # 16-bit gray 2x1: samples 0x1234, 0xFF00 -> high bytes 0x12, 0xFF
    raw = b"\x00" + bytes([0x12, 0x34, 0xFF, 0x00])
    img = codecs.decode_png(_build_png(2, 1, 16, 0, raw))
    assert img.tolist() == [[0x12, 0xFF]]


def test_png_adam7_interlace_decode():
    import numpy as np

    from ocr_ray import codecs

    rng = np.random.RandomState(11)
    h, w = 9, 11  # odd dims exercise every pass boundary
    img = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = b""
    for x0, y0, xs, ys in passes:
        sub = img[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\x00" + row.tobytes()
    out = codecs.decode_png(_build_png(w, h, 8, 0, raw, interlace=1))
    assert (out == img).all()


def test_png_invalid_combos_rejected():
    import pytest

    from ocr_ray import codecs

    # RGB at bit depth 4 is not a legal PNG combination
    raw = b"\x00" + bytes([0, 0])
    with pytest.raises(ValueError, match="color type"):
        codecs.decode_png(_build_png(1, 1, 4, 2, raw))


def test_media_features_match_golden():
    """Pin extractor output byte-for-byte to tests/golden/media_features.json
    (the VALUES-literal oracle's source): any codec/feature change must go
    through a conscious ``python -m tests.regen_golden``."""
    import json
    import os

    from tests.regen_golden import compute_media_rows

    path = os.path.join(os.path.dirname(__file__), "golden", "media_features.json")
    with open(path) as f:
        golden = json.load(f)
    assert compute_media_rows() == golden


def test_audio_mel_match_golden():
    """Pin AudioMelExtractor output to tests/golden/audio_mel.json (the
    audio_mel VALUES-oracle source)."""
    import json
    import os

    from tests.regen_golden import compute_audio_mel_rows

    path = os.path.join(os.path.dirname(__file__), "golden", "audio_mel.json")
    with open(path) as f:
        golden = json.load(f)
    rows = compute_audio_mel_rows()
    assert rows == golden
    assert all(r["status"] == "ok" for r in rows)
    # mel frame count consistent with the trimmed length and hop=64
    assert all(r["n_frames"] == 1 + max(256, r["n_trimmed"]) // 64 for r in rows)
