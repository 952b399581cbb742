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


def test_unsupported_sof_rejected():
    img = np.zeros((8, 8), dtype=np.uint8)
    enc = bytearray(jpeg.encode_jpeg(img))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC5  # rewrite SOF0 -> SOF5 (differential, unsupported)
    with pytest.raises(NotImplementedError, match="SOF5"):
        jpeg.decode_jpeg(bytes(enc))
    # a forged SOF2 whose scan is a full-band baseline scan is malformed
    # (progressive DC scans must have Se=0) — hard error, not wrong pixels
    enc[sof + 1] = 0xC2
    with pytest.raises(ValueError):
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


# --- progressive (SOF2) -------------------------------------------------------


def test_progressive_gray_matches_baseline():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(41, 29), dtype=np.uint8)
    for q in (50, 90):
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q))
        prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, quality=q))
        # identical quantized coefficients -> identical pixels (tiny float
        # slack for the vectorized DCT's different summation order)
        assert np.abs(prog.astype(int) - base.astype(int)).max() <= 1


def test_progressive_color_444_and_420():
    img = _smooth_rgb(37, 51)
    for sub in ("444", "420"):
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85, subsampling=sub))
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(img, quality=85, subsampling=sub)
        )
        assert prog.shape == (37, 51, 3)
        assert np.abs(prog.astype(int) - base.astype(int)).max() <= 1


def test_progressive_constant_image_eob_runs():
    # constant image: every AC band empty -> long EOB runs (EOBn symbols)
    img = np.full((64, 80), 200, dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, quality=90))
    assert np.abs(dec.astype(int) - 200).max() <= 1


def test_progressive_noise_psnr():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(24, 24, 3), dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, quality=95))
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
    assert np.array_equal(dec, base) or _psnr(dec, base) > 45


def test_progressive_is_sof2_and_multiscan():
    buf = jpeg.encode_jpeg_progressive(_smooth_rgb(16, 16))
    assert b"\xff\xc2" in buf and buf.count(b"\xff\xda") == 10
    arr = mm.decode_real(buf)
    assert arr.shape == (16, 16, 3)


def test_multiscan_sequential_matches_interleaved():
    """Non-interleaved sequential (one SOS per component) decodes to the
    same pixels as the interleaved baseline encoding — the layout the old
    decoder refused with NotImplementedError."""
    img = _smooth_rgb(29, 43)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    ms = jpeg.encode_jpeg_multiscan(img, quality=90)
    assert ms.count(b"\xff\xda") == 3 and b"\xff\xc0" in ms
    dec = jpeg.decode_jpeg(ms)
    assert np.abs(dec.astype(int) - base.astype(int)).max() <= 1
