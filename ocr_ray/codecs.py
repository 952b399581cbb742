"""Real media codecs from the standard library + numpy — no PIL/cv2.

The reference loads media through PIL/cv2/librosa (utils/image/io,
models/interfaces/base_image_model.py:93-122); this container ships none
of those, so round 1 stubbed real decode.  These are from-scratch
implementations of the formats that need nothing beyond stdlib:

- PNG  — zlib inflate + per-row unfilter (filters 0-4) over every static
  feature: gray 1/2/4/8/16-bit, palette 1/2/4/8-bit (+ tRNS -> RGBA),
  gray+alpha / RGB / RGBA 8/16-bit, Adam7 interlace.
- BMP  — 24-bit uncompressed BI_RGB, bottom-up rows, BGR -> RGB.
- WAV  — PCM16 via the stdlib ``wave`` module.

Encoders exist for each (filter-0 PNG, standard BMP/WAV) so tests can
round-trip arbitrary arrays.  Baseline JPEG lives in :mod:`ocr_ray.jpeg`;
video remains out of scope (needs ffmpeg, absent in this container).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# Adam7 interlace passes: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, off: int, height: int, stride: int, bpp: int):
    """Undo per-row PNG filters (0-4) over raw bytes; filtering operates on
    BYTES with a ``bpp``-byte left neighbor regardless of bit depth.
    Returns ([height, stride] uint8, new offset)."""
    need = (stride + 1) * height
    if off + need > len(raw):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        base = off + y * (stride + 1)
        f = raw[base]
        row = np.frombuffer(raw[base + 1 : base + 1 + stride], dtype=np.uint8).copy()
        if f == 0:
            recon = row
        elif f == 1:  # Sub: cumulative within each bpp column group
            recon = row.reshape(stride // bpp, bpp).cumsum(
                axis=0, dtype=np.uint64
            ).astype(np.uint8).reshape(stride) if stride % bpp == 0 else None
            if recon is None:
                recon = np.zeros(stride, dtype=np.uint8)
                for x in range(stride):
                    left = int(recon[x - bpp]) if x >= bpp else 0
                    recon[x] = (int(row[x]) + left) & 0xFF
        elif f == 2:  # Up
            recon = row + prev
        elif f in (3, 4):  # Average / Paeth: sequential in x
            recon = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(recon[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                if f == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa_, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa_ <= pb and pa_ <= pc_) else (up if pb <= pc_ else ul)
                recon[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError("PNG filter {}".format(f))
        out[y] = recon
        prev = out[y]
    return out, off + need


def _png_samples(rows: np.ndarray, width: int, ch: int, depth: int) -> np.ndarray:
    """[h, stride] filtered-out bytes -> [h, width*ch] uint8 samples.
    Sub-byte depths unpack MSB-first; 16-bit keeps the high byte (the
    standard 8-bit approximation)."""
    if depth == 8:
        return rows[:, : width * ch]
    if depth == 16:
        return rows[:, : width * ch * 2 : 2]
    per = 8 // depth
    shifts = (np.arange(per - 1, -1, -1) * depth).astype(np.uint8)
    vals = (rows[:, :, None] >> shifts[None, None, :]) & ((1 << depth) - 1)
    return vals.reshape(rows.shape[0], -1)[:, : width * ch].astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> [h, w] or [h, w, c] uint8.

    Full coverage of the static-image feature matrix: gray 1/2/4/8/16-bit,
    palette 1/2/4/8-bit (+ optional tRNS -> RGBA), gray+alpha / RGB / RGBA
    8/16-bit, Adam7 interlace.  16-bit samples are reduced to their high
    byte; sub-byte gray is rescaled to the full 0-255 range (17x / 85x /
    255x), matching the common PIL ``convert('L')`` result."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    plte = trns = None
    idat = b""
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    valid_depths = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                    4: (8, 16), 6: (8, 16)}
    if color_type not in valid_depths or bit_depth not in valid_depths[color_type]:
        raise ValueError(
            "PNG invalid color type {} / bit depth {}".format(color_type, bit_depth)
        )
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    ch = 1 if color_type == 3 else _PNG_CHANNELS[color_type]
    bpp = max(1, ch * bit_depth // 8)
    raw = zlib.decompress(idat)

    def stride_of(w: int) -> int:
        return (w * ch * bit_depth + 7) // 8

    samples = np.zeros((height, width, ch), dtype=np.uint8)
    if interlace == 0:
        rows, _ = _png_unfilter(raw, 0, height, stride_of(width), bpp)
        samples = _png_samples(rows, width, ch, bit_depth).reshape(height, width, ch)
    elif interlace == 1:
        off = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (width - x0 + xs - 1) // xs
            ph = (height - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue
            rows, off = _png_unfilter(raw, off, ph, stride_of(pw), bpp)
            sub = _png_samples(rows, pw, ch, bit_depth).reshape(ph, pw, ch)
            samples[y0::ys, x0::xs] = sub
    else:
        raise ValueError("PNG interlace method {}".format(interlace))

    if color_type == 3:
        idx = samples[:, :, 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            return np.concatenate([rgb, alpha[idx][..., None]], axis=-1)
        return rgb
    if bit_depth < 8:  # grayscale only (sub-byte depths)
        samples = samples * np.uint8(255 // ((1 << bit_depth) - 1))
    return samples[:, :, 0] if ch == 1 else samples


def encode_png(img: np.ndarray) -> bytes:
    """[h, w] or [h, w, c] uint8 -> PNG bytes (filter 0 rows)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> [h, w, 3] uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_offset,) = struct.unpack("<I", payload[10:14])
    width, height = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise NotImplementedError("BMP {}bpp compression={}".format(bpp, compression))
    flip = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    out = np.zeros((height, width, 3), dtype=np.uint8)
    for y in range(height):
        row = np.frombuffer(
            payload[data_offset + y * row_bytes : data_offset + y * row_bytes + width * 3],
            dtype=np.uint8,
        ).reshape(width, 3)
        out[height - 1 - y if flip else y] = row[:, ::-1]  # BGR -> RGB
    return out


def encode_bmp(img: np.ndarray) -> bytes:
    """[h, w, 3] uint8 RGB -> 24-bit BMP bytes."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - w * 3)
    body = b"".join(img[h - 1 - y, :, ::-1].tobytes() + pad for y in range(h))
    header = b"BM" + struct.pack(
        "<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV -> ([n] or [n, ch] int16, sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError("WAV sample width {}".format(wf.getsampwidth()))
        sr = wf.getframerate()
        ch = wf.getnchannels()
        data = np.frombuffer(wf.readframes(wf.getnframes()), dtype=np.int16)
    return (data if ch == 1 else data.reshape(-1, ch)), sr


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """[n] or [n, ch] int16 -> PCM16 WAV bytes."""
    samples = np.asarray(samples, dtype=np.int16)
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()
