"""Multimodal columns: opaque binary payloads + typed metadata, processed by
actor-pool ``map_batches`` stages.

The container ships no codec libraries (no PIL/cv2/ffmpeg), so the codecs
are FROM-SCRATCH implementations of the public formats: PNG (full filter
matrix incl. palette/interlace/16-bit), BMP, WAV (ocr_ray/codecs.py) and
baseline-DCT JPEG 4:4:4 / 4:2:0 with restart markers (ocr_ray/jpeg.py),
and MJPEG-in-AVI video built on that JPEG codec (ocr_ray/avi.py);
:func:`decode_real` dispatches on magic bytes and raises
``NotImplementedError`` only for genuinely unimplemented variants
(progressive/arithmetic JPEG, exotic BMP/WAV encodings, non-MJPEG video
codecs), exactly as a production stage fails fast on a missing codec.  Everything
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

        return avi.decode_avi_mjpeg(payload)
    if payload[:2] == b"\xff\xd8":
        from .. import jpeg

        return jpeg.decode_jpeg(payload)
    raise NotImplementedError(
        "codec not available for this payload (PNG/BMP/WAV/baseline-JPEG/"
        "MJPEG-AVI are built in; other video codecs need ffmpeg, absent "
        "in this environment)"
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
