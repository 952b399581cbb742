"""Baseline-DCT JPEG codec tests (ocr_ray.jpeg): round-trips through every
encoder/decoder path (gray / RGB, 4:4:4 / 4:2:0, restart markers, odd
dimensions, quality sweep) plus the multimodal dispatch integration.

The reference decodes JPEG via PIL/cv2 (utils/image/image_io.py:68-137);
this is the from-scratch stdlib+numpy equivalent."""

import numpy as np
import pytest

from ocr_ray import jpeg
from ocr_ray.stages import multimodal as mm


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse) if mse else np.inf


def _smooth_rgb(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [np.clip(x * 4, 0, 255), np.clip(y * 4, 0, 255), np.clip((x + y) * 2, 0, 255)],
        axis=-1,
    ).astype(np.uint8)


def test_gray_constant_exact():
    img = np.full((16, 24), 128, dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    assert dec.shape == (16, 24) and dec.dtype == np.uint8
    assert np.abs(dec.astype(int) - 128).max() == 0


def test_rgb_smooth_roundtrip_tight():
    img = _smooth_rgb(33, 47)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(float) - img.astype(float)).max() <= 4


def test_rgb_noise_psnr_q95():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (24, 24, 3), dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
    assert _psnr(dec, img) > 30


def test_gray_q100_near_lossless_odd_dims():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (13, 9), dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=100))
    assert dec.shape == (13, 9)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("restart", [0, 3])
def test_subsampling_and_restart_paths(sub, restart):
    img = _smooth_rgb(50, 70)  # non-multiple of 8 AND of 16 (4:2:0 MCU)
    enc = jpeg.encode_jpeg(img, quality=92, subsampling=sub, restart_interval=restart)
    dec = jpeg.decode_jpeg(enc)
    assert dec.shape == img.shape
    # smooth content: chroma subsampling costs almost nothing
    assert np.abs(dec.astype(float) - img.astype(float)).max() <= (4 if sub == "444" else 8)
    if restart:
        assert b"\xff\xdd" in enc  # DRI present
        assert any(bytes([0xFF, 0xD0 + i]) in enc for i in range(8))


def test_gray_restart_every_mcu():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (40, 40), dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=100, restart_interval=1))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_quality_monotone_size():
    img = _smooth_rgb(64, 64)
    sizes = [len(jpeg.encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_progressive_rejected():
    img = np.zeros((8, 8), dtype=np.uint8)
    enc = bytearray(jpeg.encode_jpeg(img))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="SOF2"):
        jpeg.decode_jpeg(bytes(enc))


def test_not_a_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_multimodal_dispatch_decodes_jpeg():
    img = _smooth_rgb(20, 28)
    arr = mm.decode_media(jpeg.encode_jpeg(img, quality=95))
    assert arr.shape == img.shape
    assert np.abs(arr.astype(float) - img.astype(float)).max() <= 4


def test_synth_media_real_features():
    t = mm.synth_media_real(20)
    out = mm.MediaFeatureExtractor()(t)
    stats = out.to_pylist()
    assert len(stats) == 20
    assert all(r["status"] == "ok" for r in stats), [
        r["error"] for r in stats if r["status"] != "ok"
    ]
    # image, audio and (since r4) MJPEG-AVI video payloads all present and
    # decoded to non-trivial stats
    kinds = {r["kind"] for r in stats}
    assert kinds == {"image", "audio", "video"}
    assert all(r["std"] > 0 for r in stats)


def test_fill_bytes_before_markers():
    """Legal T.81 padding: any number of 0xFF fill bytes may precede a
    marker.  The header scan must skip them instead of reading a bogus
    segment length (third-party encoders emit these)."""
    import numpy as np

    from ocr_ray.jpeg import decode_jpeg, encode_jpeg

    img = (np.arange(24 * 16, dtype=np.uint8).reshape(24, 16) * 3) % 251
    payload = encode_jpeg(img, quality=95)
    clean = decode_jpeg(payload)
    # inject fill bytes before the SOF0 and SOS markers
    padded = payload.replace(b"\xff\xc0", b"\xff\xff\xff\xc0").replace(
        b"\xff\xda", b"\xff\xff\xda"
    )
    assert padded != payload
    got = decode_jpeg(padded)
    assert np.array_equal(got, clean)
