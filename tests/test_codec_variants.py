"""Long-tail codec-variant tests (round 5): WAV beyond PCM16 (u8 / 24 /
32-bit / IEEE float / WAVE_FORMAT_EXTENSIBLE / G.711 A-law & mu-law),
BMP beyond 24-bit (palette 8/4/1-bit, RLE8, 32-bit), and uncompressed
DIB-in-AVI — each decoded by the from-scratch public-spec decoders in
ocr_ray.codecs / ocr_ray.avi (reference analog: the PIL/cv2/soundfile
wrappers in utils/image/image_io.py and utils/audio/audio_io.py)."""

import numpy as np
import pytest

from ocr_ray import avi, codecs


RNG = np.random.RandomState(11)
PCM = RNG.randint(-32768, 32768, size=1000).astype(np.int16)


@pytest.mark.parametrize("fmt", ["pcm16", "ext16", "pcm24", "pcm32"])
def test_wav_exact_formats(fmt):
    dec, sr = codecs.decode_wav(codecs.encode_wav_fmt(PCM, 8000, fmt))
    assert sr == 8000 and (dec == PCM).all()


@pytest.mark.parametrize("fmt,tol", [("u8", 256), ("f32", 1), ("f64", 1)])
def test_wav_quantized_formats(fmt, tol):
    dec, _ = codecs.decode_wav(codecs.encode_wav_fmt(PCM, 16000, fmt))
    assert np.abs(dec.astype(int) - PCM.astype(int)).max() <= tol


@pytest.mark.parametrize(
    "name,compress,expand,maxerr",
    [
        ("mulaw", codecs.mulaw_compress, codecs.mulaw_expand, 1024),
        ("alaw", codecs.alaw_compress, codecs.alaw_expand, 1024),
    ],
)
def test_g711_companding(name, compress, expand, maxerr):
    # compress->expand error bounded by the top-segment step size
    dec = expand(compress(PCM))
    assert np.abs(dec.astype(int) - PCM.astype(int)).max() <= maxerr
    # expanding all 256 codes then re-compressing is the identity
    codes = np.arange(256, dtype=np.uint8)
    lin = expand(codes)
    assert (expand(compress(lin)) == lin).all()
    # odd symmetry of the expanded values across the sign bit
    assert int(lin.astype(int).sum()) == 0


@pytest.mark.parametrize("fmt", ["alaw", "mulaw"])
def test_wav_g711_end_to_end(fmt):
    dec, sr = codecs.decode_wav(codecs.encode_wav_fmt(PCM, 8000, fmt))
    assert sr == 8000 and np.abs(dec.astype(int) - PCM.astype(int)).max() <= 1024


def test_wav_stereo_and_unknown_tag():
    st = RNG.randint(-32768, 32768, size=(256, 2)).astype(np.int16)
    dec, _ = codecs.decode_wav(codecs.encode_wav_fmt(st, 44100, "pcm16"))
    assert dec.shape == (256, 2) and (dec == st).all()
    buf = bytearray(codecs.encode_wav_fmt(PCM, 8000, "pcm16"))
    buf[20] = 0x55  # forge an unknown format tag
    with pytest.raises(NotImplementedError, match="0x0055"):
        codecs.decode_wav(bytes(buf))


def test_bmp32_exact():
    img = RNG.randint(0, 256, size=(13, 11, 3), dtype=np.uint8)
    assert (codecs.decode_bmp(codecs.encode_bmp32(img)) == img).all()


def test_bmp_pal8_exact():
    pal = RNG.randint(0, 256, size=(256, 3), dtype=np.uint8)
    idx = RNG.randint(0, 256, size=(9, 17), dtype=np.uint8)
    assert (codecs.decode_bmp(codecs.encode_bmp_pal8(idx, pal)) == pal[idx]).all()


def test_bmp_rle8_exact():
    pal = RNG.randint(0, 256, size=(256, 3), dtype=np.uint8)
    idx = np.repeat(RNG.randint(0, 8, size=(7, 5), dtype=np.uint8), 3, axis=1)
    assert (codecs.decode_bmp(codecs.encode_bmp_rle8(idx, pal)) == pal[idx]).all()


def test_bmp_rle8_absolute_and_delta_modes():
    # hand-built RLE stream: run, absolute block, delta skip, EOL, EOF
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[:, 0] = np.arange(256)
    w, h = 8, 2
    rle = bytes(
        [3, 5]            # run: 3 x index 5
        + [0, 3, 7, 8, 9, 0]  # absolute: indices 7,8,9 (padded to word)
        + [0, 2, 2, 0]    # delta: skip 2 right
        + [0, 0]          # end of line
        + [2, 1]          # second row: 2 x index 1
        + [0, 1]          # end of bitmap
    )
    body = codecs._bmp_header(w, h, 8, 1, pal, rle) + rle
    out = codecs.decode_bmp(body)
    # bottom-up: decoded row 0 of the stream is the LAST image row
    assert list(out[1, :, 0]) == [5, 5, 5, 7, 8, 9, 0, 0]
    assert list(out[0, :2, 0]) == [1, 1]


def test_bmp_1bit_and_4bit():
    pal2 = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx1 = RNG.randint(0, 2, size=(6, 10), dtype=np.uint8)
    h, w = idx1.shape
    row_bytes = (w + 31) // 32 * 4
    bits = np.zeros((h, row_bytes * 8), dtype=np.uint8)
    bits[:, :w] = idx1[::-1]
    rows = np.packbits(bits, axis=1).tobytes()
    buf = codecs._bmp_header(w, h, 1, 0, pal2, rows) + rows
    assert (codecs.decode_bmp(buf) == pal2[idx1]).all()

    pal16 = RNG.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx4 = RNG.randint(0, 16, size=(5, 7), dtype=np.uint8)
    h, w = idx4.shape
    row_bytes = (w * 4 + 31) // 32 * 4
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    for y in range(h):
        r = idx4[h - 1 - y]
        for i in range(0, w, 2):
            rows[y, i // 2] = (r[i] << 4) | (r[i + 1] if i + 1 < w else 0)
    buf = codecs._bmp_header(w, h, 4, 0, pal16, rows.tobytes()) + rows.tobytes()
    assert (codecs.decode_bmp(buf) == pal16[idx4]).all()


def test_bmp_unsupported_raises():
    img = RNG.randint(0, 256, size=(4, 4, 3), dtype=np.uint8)
    buf = bytearray(codecs.encode_bmp(img))
    buf[28] = 16  # forge 16bpp
    with pytest.raises(NotImplementedError, match="16bpp"):
        codecs.decode_bmp(bytes(buf))


def test_avi_dib_exact_roundtrip():
    frames = RNG.randint(0, 256, size=(4, 11, 13, 3), dtype=np.uint8)  # odd w: row pad
    buf = avi.encode_avi_raw(frames, fps=15)
    assert (avi.decode_avi(buf) == frames).all()
    # the MJPEG-named entry point dispatches on the stream handler too
    assert (avi.decode_avi_mjpeg(buf) == frames).all()


@pytest.mark.parametrize("predictor", list(range(1, 8)))
def test_jpeg_lossless_bit_exact_every_predictor(predictor):
    from ocr_ray import jpeg

    img = RNG.randint(0, 256, size=(17, 23, 3), dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg_lossless(img, predictor=predictor))
    assert dec.dtype == np.uint8 and (dec == img).all()


def test_jpeg_lossless_gray_and_restarts():
    from ocr_ray import jpeg

    gray = RNG.randint(0, 256, size=(9, 31), dtype=np.uint8)
    assert (jpeg.decode_jpeg(jpeg.encode_jpeg_lossless(gray, predictor=4)) == gray).all()
    img = RNG.randint(0, 256, size=(17, 23, 3), dtype=np.uint8)
    for ri in (5, 23, 31):  # including mid-row restarts
        buf = jpeg.encode_jpeg_lossless(img, predictor=7, restart_interval=ri)
        assert (jpeg.decode_jpeg(buf) == img).all()


def test_jpeg_lossless_compresses_smooth_content():
    from ocr_ray import jpeg

    y, x = np.mgrid[0:64, 0:64]
    sm = np.clip(x * 2 + y, 0, 255).astype(np.uint8)
    buf = jpeg.encode_jpeg_lossless(sm, predictor=4)
    assert len(buf) < 0.5 * sm.size  # predictor residuals must actually code small
    assert (jpeg.decode_jpeg(buf) == sm).all()


def test_jpeg_hierarchical_still_raises():
    from ocr_ray import jpeg

    buf = bytearray(jpeg.encode_jpeg_lossless(np.zeros((4, 4), dtype=np.uint8)))
    at = bytes(buf).index(b"\xff\xc3")
    buf[at + 1] = 0xC5  # forge a differential-sequential SOF
    with pytest.raises(NotImplementedError, match="SOF5"):
        jpeg.decode_jpeg(bytes(buf))


# --- property tests: random shapes/content through every variant ----------

from hypothesis import given, settings, strategies as st


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 200).map(lambda n: n * 7 % 97 + 1),
    st.sampled_from(["u8", "pcm16", "pcm24", "pcm32", "f32", "f64",
                     "alaw", "mulaw", "ext16"]),
    st.integers(0, 2**32 - 1),
)
def test_wav_variant_property(n, fmt, seed):
    rng = np.random.RandomState(seed % 2**31)
    x = rng.randint(-32768, 32768, size=n).astype(np.int16)
    dec, sr = codecs.decode_wav(codecs.encode_wav_fmt(x, 22050, fmt))
    assert sr == 22050 and dec.shape == x.shape
    tol = {"u8": 256, "alaw": 1024, "mulaw": 1024}.get(fmt, 1)
    assert np.abs(dec.astype(int) - x.astype(int)).max() <= tol


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**31 - 1),
       st.sampled_from(["pal8", "rle8", "bmp32", "bmp24"]))
def test_bmp_variant_property(w, h, seed, variant):
    rng = np.random.RandomState(seed)
    if variant in ("pal8", "rle8"):
        pal = rng.randint(0, 256, size=(256, 3), dtype=np.uint8)
        idx = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
        enc = codecs.encode_bmp_rle8 if variant == "rle8" else codecs.encode_bmp_pal8
        assert (codecs.decode_bmp(enc(idx, pal)) == pal[idx]).all()
    else:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        enc = codecs.encode_bmp32 if variant == "bmp32" else codecs.encode_bmp
        assert (codecs.decode_bmp(enc(img)) == img).all()


@settings(max_examples=10, deadline=None)
@given(st.integers(1, 6), st.integers(4, 24), st.integers(4, 24),
       st.integers(0, 2**31 - 1), st.sampled_from([None, "xiph", "ebml", "fixed"]),
       st.integers(1, 4))
def test_mkv_uncompressed_property(nf, w, h, seed, lacing, cluster_frames):
    from ocr_ray import mkv

    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
    buf = mkv.encode_mkv(frames, codec="V_UNCOMPRESSED", lacing=lacing,
                         cluster_frames=cluster_frames)
    assert (mkv.decode_mkv(buf) == frames).all()


@settings(max_examples=10, deadline=None)
@given(st.integers(1, 30), st.integers(1, 30), st.integers(1, 7),
       st.integers(0, 2**31 - 1), st.integers(0, 40))
def test_jpeg_lossless_property(w, h, predictor, seed, ri):
    from ocr_ray import jpeg

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    buf = jpeg.encode_jpeg_lossless(img, predictor=predictor, restart_interval=ri)
    assert (jpeg.decode_jpeg(buf) == img).all()


def test_synth_media_exotic_all_decode():
    from ocr_ray.stages import multimodal as mm

    t = mm.synth_media_exotic(30)
    assert t.num_rows == 30
    out = mm.MediaFeatureExtractor()(t)
    assert set(out.column("status").to_pylist()) == {"ok"}
