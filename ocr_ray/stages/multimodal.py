"""Multimodal columns: opaque binary payloads + typed metadata, processed by
actor-pool ``map_batches`` stages.

The container ships no codec libraries (no PIL/cv2/ffmpeg), so the codecs
are FROM-SCRATCH implementations of the public formats: PNG (full filter
matrix incl. palette/interlace/16-bit), BMP (24/32-bit, palette,
RLE8), WAV (PCM u8..32 / float / G.711) in ocr_ray/codecs.py,
baseline+progressive JPEG 4:4:4 / 4:2:0 with restart markers
(ocr_ray/jpeg.py), MJPEG-or-DIB-in-AVI video (ocr_ray/avi.py) and
Matroska V_MJPEG / V_UNCOMPRESSED with all lacing modes (ocr_ray/mkv.py);
:func:`decode_real` dispatches on magic bytes and raises
``NotImplementedError`` only for genuinely unimplemented variants
(arithmetic JPEG, compressed non-MJPEG video codecs — those need
ffmpeg), exactly as a production stage fails
fast on a missing codec.  Everything
around the codecs — schema, payload sniffing, actor signature, batch
sizing, deterministic feature extraction, resize, frame sampling, output
layout — is likewise real and tested.

Payload dialect (deterministic, written by :func:`synth_media`):

    IMG1 | u16 width | u16 height | u8 channels | raw bytes (w*h*c)
    AUD1 | u32 sample_rate | u32 n_samples | int16 PCM
    VID1 | u16 width | u16 height | u16 n_frames | frames of raw gray bytes

The reference analog is the image interface (load/resize/normalize,
/root/reference/models/interfaces/base_image_model.py:93-122 and
utils/image/image_processing.py:19-142): ``resize_media`` implements the
same aspect-preserving nearest-neighbor resize over numpy.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MEDIA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image|audio|video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)

FEATURES = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("n_bytes", pa.int64()),
        ("mean", pa.float64()),
        ("std", pa.float64()),
        ("histogram", pa.list_(pa.int64())),  # 16 bins
        ("status", pa.string()),
        ("error", pa.string()),
    ]
)


def synth_media(n: int = 48, seed: int = 23) -> pa.Table:
    """Deterministic media table cycling image/audio/video payloads."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            w, h, c = int(rng.randint(8, 32)), int(rng.randint(8, 32)), 3
            data = rng.randint(0, 256, size=w * h * c, dtype=np.uint8).tobytes()
            payload = b"IMG1" + struct.pack("<HHB", w, h, c) + data
            meta = (w, h, 0, 0)
        elif kind == "audio":
            sr, ns = 16000, int(rng.randint(100, 1000))
            pcm = rng.randint(-32768, 32767, size=ns, dtype=np.int16).tobytes()
            payload = b"AUD1" + struct.pack("<II", sr, ns) + pcm
            meta = (0, 0, sr, 0)
        else:
            w, h, nf = int(rng.randint(4, 12)), int(rng.randint(4, 12)), int(rng.randint(2, 10))
            data = rng.randint(0, 256, size=w * h * nf, dtype=np.uint8).tobytes()
            payload = b"VID1" + struct.pack("<HHH", w, h, nf) + data
            meta = (w, h, 0, nf)
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "width": meta[0],
                "height": meta[1],
                "sample_rate": meta[2],
                "n_frames": meta[3],
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA)


def synth_media_real(n: int = 16, seed: int = 31) -> pa.Table:
    """Deterministic media table whose payloads are REAL codec bytes
    (PNG / BMP / WAV / baseline JPEG in both 4:4:4 and 4:2:0 / MJPEG-AVI
    video), exercising the from-scratch decoders in :mod:`ocr_ray.codecs`
    / :mod:`ocr_ray.jpeg` / :mod:`ocr_ray.avi` end-to-end through the
    feature-extraction actor pool."""
    from .. import avi, codecs, jpeg

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        fmt = ("png", "bmp", "wav", "jpeg444", "jpeg420", "avi", "jpeg_prog")[i % 7]
        if fmt == "wav":
            sr, ns = 8000, int(rng.randint(64, 512))
            pcm = rng.randint(-32768, 32767, size=ns, dtype=np.int16)
            payload = codecs.encode_wav(pcm, sr)
            kind, meta = "audio", (0, 0, sr, 0)
        elif fmt == "avi":
            w, h = 8 * int(rng.randint(1, 4)), 8 * int(rng.randint(1, 4))
            nf = int(rng.randint(2, 6))
            frames = rng.randint(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
            payload = avi.encode_avi_mjpeg(frames, fps=10)
            kind, meta = "video", (w, h, 0, nf)
        else:
            w, h = int(rng.randint(9, 33)), int(rng.randint(9, 33))
            img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            if fmt == "png":
                payload = codecs.encode_png(img)
            elif fmt == "bmp":
                payload = codecs.encode_bmp(img)
            elif fmt == "jpeg_prog":
                payload = jpeg.encode_jpeg_progressive(img, quality=92)
            else:
                payload = jpeg.encode_jpeg(
                    img,
                    quality=92,
                    subsampling="420" if fmt == "jpeg420" else "444",
                    restart_interval=3 if fmt == "jpeg420" else 0,
                )
            kind, meta = "image", (w, h, 0, 0)
        rows.append(
            {
                "media_id": 1000 + i,
                "kind": kind,
                "payload": payload,
                "width": meta[0],
                "height": meta[1],
                "sample_rate": meta[2],
                "n_frames": meta[3],
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA)


def synth_media_exotic(n: int = 24, seed: int = 57) -> pa.Table:
    """Deterministic media table covering the LONG-TAIL codec variants
    (round-5 coverage of the formats the earlier decoders rejected):
    Matroska video (V_MJPEG and V_UNCOMPRESSED with every lacing mode),
    uncompressed DIB-in-AVI, WAV in PCM-u8/24/32-bit, IEEE float,
    WAVE_FORMAT_EXTENSIBLE, ITU G.711 A-law / mu-law, BMP in 8-bit
    palette / RLE8 / 32-bit forms, and lossless JPEG (SOF3)."""
    from .. import avi, codecs, mkv

    fmts = (
        "mkv_mjpeg", "mkv_raw", "mkv_raw_xiph", "mkv_raw_ebml", "avi_dib",
        "wav_u8", "wav_24", "wav_32", "wav_f32", "wav_ext", "wav_alaw",
        "wav_mulaw", "bmp8", "bmp_rle8", "bmp32", "jpeg_lossless",
    )
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        fmt = fmts[i % len(fmts)]
        if fmt.startswith("wav_"):
            sr, ns = 8000, int(rng.randint(64, 512))
            pcm = rng.randint(-32768, 32767, size=ns, dtype=np.int16)
            wav_fmt = {"wav_u8": "u8", "wav_24": "pcm24", "wav_32": "pcm32",
                       "wav_f32": "f32", "wav_ext": "ext16", "wav_alaw": "alaw",
                       "wav_mulaw": "mulaw"}[fmt]
            payload = codecs.encode_wav_fmt(pcm, sr, wav_fmt)
            kind, meta = "audio", (0, 0, sr, 0)
        elif fmt.startswith("mkv") or fmt == "avi_dib":
            w, h = 8 * int(rng.randint(1, 4)), 8 * int(rng.randint(1, 4))
            nf = int(rng.randint(2, 6))
            frames = rng.randint(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
            if fmt == "avi_dib":
                payload = avi.encode_avi_raw(frames, fps=10)
            elif fmt == "mkv_mjpeg":
                payload = mkv.encode_mkv(frames, fps=10, codec="V_MJPEG")
            else:
                lacing = {"mkv_raw": None, "mkv_raw_xiph": "xiph",
                          "mkv_raw_ebml": "ebml"}[fmt]
                payload = mkv.encode_mkv(
                    frames, fps=10, codec="V_UNCOMPRESSED", lacing=lacing,
                    cluster_frames=3,
                )
            kind, meta = "video", (w, h, 0, nf)
        else:
            w, h = int(rng.randint(9, 33)), int(rng.randint(9, 33))
            img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            if fmt == "jpeg_lossless":
                from .. import jpeg

                payload = jpeg.encode_jpeg_lossless(img, predictor=1 + i % 7)
            elif fmt == "bmp32":
                payload = codecs.encode_bmp32(img)
            else:
                pal = rng.randint(0, 256, size=(256, 3), dtype=np.uint8)
                idx = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
                if fmt == "bmp_rle8":
                    idx = np.repeat(idx[:, : (w + 2) // 3], 3, axis=1)[:, :w]  # runs
                    payload = codecs.encode_bmp_rle8(idx, pal)
                else:
                    payload = codecs.encode_bmp_pal8(idx, pal)
            kind, meta = "image", (w, h, 0, 0)
        rows.append(
            {
                "media_id": 2000 + i,
                "kind": kind,
                "payload": payload,
                "width": meta[0],
                "height": meta[1],
                "sample_rate": meta[2],
                "n_frames": meta[3],
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA)


def decode_real(payload: bytes):
    """Decode a real media codec: PNG / BMP / WAV / baseline JPEG /
    MJPEG-in-AVI video are implemented from scratch on stdlib+numpy
    (:mod:`ocr_ray.codecs`, :mod:`ocr_ray.jpeg`, :mod:`ocr_ray.avi`);
    other codecs fail fast with the gap stated (reference analog: cv2
    container readers, utils/image/image_io.py:181-389)."""
    from .. import codecs

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return codecs.decode_png(payload)
    if payload[:2] == b"BM":
        return codecs.decode_bmp(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return codecs.decode_wav(payload)[0]
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from .. import avi

        return avi.decode_avi(payload)
    if payload[:4] == b"\x1a\x45\xdf\xa3":
        from .. import mkv

        return mkv.decode_mkv(payload)
    if payload[:2] == b"\xff\xd8":
        from .. import jpeg

        return jpeg.decode_jpeg(payload)
    raise NotImplementedError(
        "codec not available for this payload (PNG/BMP/WAV/baseline-JPEG/"
        "MJPEG-or-DIB-AVI/Matroska are built in; other video codecs need "
        "ffmpeg, absent in this environment)"
    )


def decode_media(payload: bytes) -> np.ndarray:
    """Decode the deterministic synthetic dialect -> numpy array.

    image -> [h, w, c] uint8; audio -> [n] int16; video -> [f, h, w] uint8.
    Unknown magic falls through to :func:`decode_real` (which states the
    codec gap explicitly)."""
    magic = payload[:4]
    if magic == b"IMG1":
        w, h, c = struct.unpack("<HHB", payload[4:9])
        return np.frombuffer(payload[9 : 9 + w * h * c], dtype=np.uint8).reshape(h, w, c)
    if magic == b"AUD1":
        sr, ns = struct.unpack("<II", payload[4:12])
        return np.frombuffer(payload[12 : 12 + 2 * ns], dtype=np.int16)
    if magic == b"VID1":
        w, h, nf = struct.unpack("<HHH", payload[4:10])
        return np.frombuffer(payload[10 : 10 + w * h * nf], dtype=np.uint8).reshape(nf, h, w)
    return decode_real(payload)


def resize_media(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (aspect handled by caller), pure numpy —
    the resize_image analog (image_processing.py:19-85)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def sample_frames(video: np.ndarray, k: int) -> np.ndarray:
    """Deterministic stride frame sampling: k evenly spaced frames."""
    nf = video.shape[0]
    idx = np.linspace(0, nf - 1, num=min(k, nf)).astype(np.int64)
    return video[idx]


class MediaFeatureExtractor:
    """Actor-pool stage: decode + per-item features, error rows on garbage.

    Small ``batch_size`` is mandatory here: payloads are wide binary, so a
    batch x pool_size must fit the worker heap (SURVEY 'memory-aware')."""

    def __init__(self, n_bins: int = 16):
        self.n_bins = n_bins
        self.edges = np.linspace(0, 256, n_bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            base = {
                "media_id": mid, "kind": kind, "n_bytes": len(payload or b""),
                "mean": 0.0, "std": 0.0, "histogram": [0] * self.n_bins,
                "status": "ok", "error": "",
            }
            try:
                arr = decode_media(payload)
                flat = arr.astype(np.float64).ravel()
                hist, _ = np.histogram(
                    flat, bins=self.n_bins,
                    range=(-32768, 32768) if kind == "audio" else (0, 256),
                )
                rows.append(
                    dict(
                        base,
                        mean=round(float(flat.mean()), 4),
                        std=round(float(flat.std()), 4),
                        histogram=[int(x) for x in hist],
                    )
                )
            except NotImplementedError as exc:
                rows.append(dict(base, status="error", error=str(exc)))
            except Exception as exc:
                rows.append(
                    dict(base, status="error",
                         error="{}: {}".format(type(exc).__name__, exc))
                )
        return pa.Table.from_pylist(rows, schema=FEATURES)


def media_features(media_ds, *, concurrency=2, batch_size: int = 16):
    """media table -> per-item feature table via the actor pool."""
    return media_ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


MEL_FEATURES = pa.schema(
    [
        ("media_id", pa.int64()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
        ("n_frames", pa.int64()),       # mel frames
        ("n_trimmed", pa.int64()),      # samples after RMS silence trim
        ("mel_mean", pa.float64()),
        ("mel_std", pa.float64()),
        ("peak_band", pa.int32()),      # hottest mel band (time-mean argmax)
        ("status", pa.string()),
        ("error", pa.string()),
    ]
)


class AudioMelExtractor:
    """Actor-pool stage: audio payloads -> log-mel summary features.

    The full audio front-end of the reference (decode -> normalize to
    [-1, 1] -> RMS silence trim -> log-mel spectrogram; stft.py:282-315 +
    audio_processing.py:35-198) run once per item inside ``__call__``; the
    mel filterbank is built ONCE per actor in ``__init__`` — the stateful
    setup the actor pool exists for.  Non-audio rows and undecodable
    payloads become error rows, never a crash."""

    def __init__(self, n_mels: int = 16, filter_length: int = 256, hop_length: int = 64):
        from ..functions import audio as A

        self.A = A
        self.n_mels, self.fl, self.hop = n_mels, filter_length, hop_length
        self._fb = {}  # sample_rate -> filterbank, built once per rate

    def _mel(self, samples: np.ndarray, sr: int) -> np.ndarray:
        A = self.A
        if sr not in self._fb:
            self._fb[sr] = A.mel_filterbank(sr, self.fl, self.n_mels)
        mag = A.stft_magnitude(samples, self.fl, self.hop)
        return np.log(np.maximum(mag @ self._fb[sr].T, 1e-5))

    def __call__(self, batch: pa.Table) -> pa.Table:
        A = self.A
        rows = []
        for mid, kind, payload, sr_meta in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("sample_rate").to_pylist(),
        ):
            base = {
                "media_id": mid, "sample_rate": 0, "n_samples": 0,
                "n_frames": 0, "n_trimmed": 0, "mel_mean": 0.0,
                "mel_std": 0.0, "peak_band": -1, "status": "ok", "error": "",
            }
            try:
                if kind != "audio":
                    rows.append(dict(base, status="skipped", error="not audio"))
                    continue
                pcm = decode_media(payload)
                sr = int(sr_meta or 16000)
                f = A.convert_audio_dtype(pcm.astype(np.int16), np.float32)
                trimmed = A.trim_silence(f, sr, mode="start_end")
                wl = self.fl
                mel = self._mel(
                    np.pad(trimmed, (0, max(0, wl - len(trimmed)))), sr
                )
                rows.append(
                    dict(
                        base,
                        sample_rate=sr,
                        n_samples=len(f),
                        n_frames=mel.shape[0],
                        n_trimmed=len(trimmed),
                        mel_mean=round(float(mel.mean()), 4),
                        mel_std=round(float(mel.std()), 4),
                        peak_band=int(np.argmax(mel.mean(axis=0))),
                    )
                )
            except Exception as exc:
                rows.append(
                    dict(base, status="error",
                         error="{}: {}".format(type(exc).__name__, exc))
                )
        return pa.Table.from_pylist(rows, schema=MEL_FEATURES)


def audio_mel_features(media_ds, *, concurrency=2, batch_size: int = 16):
    """media table (audio rows) -> per-item log-mel summary table."""
    return media_ds.map_batches(
        AudioMelExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# perceptual-hash image near-dup (round 4)
# ---------------------------------------------------------------------------
#
# The image-side analog of SimHash text near-dup: a 63-bit DCT perceptual
# hash per image (classic pHash recipe — grayscale, 32x32 area resample,
# 2-D DCT-II, sign-vs-median of the low-frequency block), then the SAME
# LSH shape as stages/dedup: band the hash, groupby band buckets, verify
# candidates by hamming distance.  Robust to re-encoding (PNG vs JPEG vs
# BMP of the same picture) and small noise — exactly the recrawl/mirror
# duplicate case a 100-TB image corpus needs.


def dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (public textbook formula)."""
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * x + 1) * k / (2.0 * n))
    m[0] /= np.sqrt(2.0)
    return m


def phash64(img: np.ndarray, dct: np.ndarray) -> int:
    """63-bit perceptual hash of an HxWx3 (or HxW) uint8 image."""
    g = img.astype(np.float64)
    if g.ndim == 3:
        g = g.mean(axis=2)
    h, w = g.shape
    # area resample to 32x32: mean of source pixels per target cell
    ty = np.arange(h) * 32 // h
    tx = np.arange(w) * 32 // w
    cell = (ty[:, None] * 32 + tx[None, :]).ravel()
    sums = np.bincount(cell, weights=g.ravel(), minlength=1024)
    cnts = np.maximum(np.bincount(cell, minlength=1024), 1)
    small = (sums / cnts).reshape(32, 32)
    low = (dct @ small @ dct.T)[:8, :8].ravel()[1:]  # drop DC
    med = np.median(low)
    bits = low > med
    return int(np.packbits(bits, bitorder="little")[:8].view(np.uint64)[0])


def _smooth_field(rng, h: int, w: int, ch: int = 6, cw: int = 8) -> np.ndarray:
    """Bilinear upsample of a coarse random grid — a smooth 'photo-like'
    field whose DCT low block has broad, well-separated coefficients (a
    sparse sinusoid spectrum would leave many coefficients AT the median,
    making the hash sign-flip under noise)."""
    coarse = rng.uniform(0.0, 255.0, (ch, cw))
    y = np.linspace(0, ch - 1, h)
    x = np.linspace(0, cw - 1, w)
    y0 = np.floor(y).astype(int)
    x0 = np.floor(x).astype(int)
    y1 = np.minimum(y0 + 1, ch - 1)
    x1 = np.minimum(x0 + 1, cw - 1)
    wy = (y - y0)[:, None]
    wx = (x - x0)[None, :]
    return (
        coarse[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
        + coarse[np.ix_(y1, x0)] * wy * (1 - wx)
        + coarse[np.ix_(y0, x1)] * (1 - wy) * wx
        + coarse[np.ix_(y1, x1)] * wy * wx
    )


def synth_images_neardup(n: int = 36, seed: int = 41) -> pa.Table:
    """Deterministic image table with PLANTED near-duplicates: smooth
    random-field 'photos'; every (3k+1)-th image is a noised, re-encoded
    copy of image 3k (different codec, +-4 noise, +3 brightness) — a true
    near-dup; all other images draw independent fields."""
    from .. import codecs, jpeg

    rng = np.random.RandomState(seed)
    rows = []
    base_img = None
    for i in range(n):
        if i % 3 == 1 and base_img is not None:
            img = base_img.astype(np.int64)
            img = img + rng.randint(-4, 5, size=img.shape) + 3
            img = np.clip(img, 0, 255).astype(np.uint8)
        else:
            g = _smooth_field(np.random.RandomState(seed * 1000 + i), 48, 64)
            img = np.clip(
                np.stack([g, np.roll(g, 3, axis=1), np.roll(g, 7, axis=0)], axis=2),
                0,
                255,
            ).astype(np.uint8)
            base_img = img
        fmt = ("png", "jpeg", "bmp")[i % 3]
        if fmt == "png":
            payload = codecs.encode_png(img)
        elif fmt == "bmp":
            payload = codecs.encode_bmp(img)
        else:
            payload = jpeg.encode_jpeg(img, quality=95, subsampling="444")
        rows.append(
            {
                "media_id": i,
                "kind": "image",
                "payload": payload,
                "width": img.shape[1],
                "height": img.shape[0],
                "sample_rate": 0,
                "n_frames": 0,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA)


class PHashStage:
    """Actor-pool stage: image payload -> 63-bit perceptual hash.  The
    DCT basis is built ONCE per actor in ``__init__``; decode + hash per
    item in ``__call__`` (per-item work is the honest payload cost, the
    same shape as MediaFeatureExtractor)."""

    def __init__(self):
        self.dct = dct_matrix(32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            img = decode_real(payload)
            ids.append(mid)
            hashes.append(np.int64(np.uint64(phash64(img, self.dct))))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "phash": pa.array(hashes, pa.int64()),
            }
        )


PHASH_BANDS = 4
PHASH_HAMMING_T = 10


def phash_neardup_pairs(media_ds, *, concurrency=2, batch_size: int = 16):
    """Image Dataset -> verified near-dup pairs (a, b, hamming<=T).

    LSH shape (same plan as dedup.simhash): band each 64-bit hash into 4
    x 16-bit bands, groupby (band, value) buckets — near-identical hashes
    collide in at least one band with high probability — then one
    vectorized hamming verify per bucket and an aggregate distinct over
    the (a, b) pairs.  The corpus never moves: only (media_id, band,
    16-bit value) rows shuffle."""
    import pandas as pd

    hashed = media_ds.map_batches(
        PHashStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )

    def band_rows(batch: pa.Table) -> pa.Table:
        h = batch.column("phash").to_numpy().astype(np.uint64)
        mid = batch.column("media_id").to_numpy()
        n = len(h)
        bands = np.arange(PHASH_BANDS, dtype=np.uint64)
        vals = (h[:, None] >> (bands * np.uint64(16))) & np.uint64(0xFFFF)
        return pa.table(
            {
                "band": pa.array(np.tile(bands, n).astype(np.int64)),
                "val": pa.array(vals.ravel().astype(np.int64)),
                "media_id": pa.array(np.repeat(mid, PHASH_BANDS)),
                "phash": pa.array(np.repeat(batch.column("phash").to_numpy(), PHASH_BANDS)),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("media_id")
        mid = g["media_id"].to_numpy()
        h = g["phash"].to_numpy().astype(np.uint64)
        ia, ib = np.triu_indices(len(g), k=1)
        if not len(ia):
            return pd.DataFrame({"a": [], "b": [], "hamming": []}).astype(np.int64)
        x = h[ia] ^ h[ib]
        ham = np.zeros(len(x), dtype=np.int64)
        while x.any():
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= PHASH_HAMMING_T
        return pd.DataFrame(
            {"a": mid[ia[keep]], "b": mid[ib[keep]], "hamming": ham[keep]}
        )

    from .dedup import distinct_rows

    # (a, b) is CANDIDATE-PAIR-cardinality: the distinct fold runs through
    # the bucketed lexsort/reduceat kernel (r5), carrying the pair's
    # constant hamming distance as its per-key min
    return distinct_rows(
        hashed.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "val"])
        .map_groups(bucket_pairs, batch_format="pandas"),
        ["a", "b"],
        min_cols=["hamming"],
    )


# ---------------------------------------------------------------------------
# frame-stream source (round 4): the camera/video streaming analog
# ---------------------------------------------------------------------------
#
# The reference streams camera/video as a generator of frames with a
# frame_index (utils/image/image_io.py:391-461) and subsamples by stride.
# Here a video payload column explodes into ordered per-frame rows via an
# actor-pool stage — the Dataset-native recast of the frame generator:
# ordering rides in the (media_id, frame_index) columns instead of
# generator position, so downstream stages stay order-independent.

FRAME_STRIDE = 2


class FrameSampler:
    """Actor-pool stage: video payloads -> ordered per-frame feature rows
    (every FRAME_STRIDE-th frame, the reference's subsample knob).
    Non-video rows are passed over silently; undecodable payloads become
    error rows."""

    def __init__(self, stride: int = FRAME_STRIDE):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "video":
                continue
            try:
                video = (
                    decode_real(payload)
                    if payload[:4] == b"RIFF"
                    else decode_media(payload)
                )
                for fi in range(0, len(video), self.stride):
                    frame = np.asarray(video[fi], dtype=np.float64)
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_index": fi,
                            "mean": round(float(frame.mean()), 4),
                            "std": round(float(frame.std()), 4),
                            "status": "ok",
                        }
                    )
            except Exception as exc:
                rows.append(
                    {
                        "media_id": mid,
                        "frame_index": -1,
                        "mean": 0.0,
                        "std": 0.0,
                        "status": "error: {}".format(type(exc).__name__),
                    }
                )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("media_id", pa.int64()),
                    ("frame_index", pa.int64()),
                    ("mean", pa.float64()),
                    ("std", pa.float64()),
                    ("status", pa.string()),
                ]
            ),
        )


def video_frames(media_ds, *, concurrency=2, batch_size: int = 16):
    """media table -> ordered per-frame feature rows via the actor pool."""
    return media_ds.map_batches(
        FrameSampler,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
