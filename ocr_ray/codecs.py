"""Real media codecs from the standard library + numpy — no PIL/cv2.

The reference loads media through PIL/cv2/librosa (utils/image/io,
models/interfaces/base_image_model.py:93-122); this container ships none
of those, so round 1 stubbed real decode.  These are from-scratch
implementations of the formats that need nothing beyond stdlib:

- PNG  — zlib inflate + per-row unfilter (filters 0-4) over every static
  feature: gray 1/2/4/8/16-bit, palette 1/2/4/8-bit (+ tRNS -> RGBA),
  gray+alpha / RGB / RGBA 8/16-bit, Adam7 interlace.
- BMP  — 24/32-bit uncompressed BI_RGB, 1/4/8-bit palette, 8-bit RLE
  (BI_RLE8), bottom-up and top-down rows, BGR -> RGB.
- WAV  — direct RIFF fmt/data parse: PCM u8/16/24/32-bit, IEEE
  float32/64, ITU G.711 A-law / mu-law (vectorized companding below),
  and WAVE_FORMAT_EXTENSIBLE, all normalized to the int16 domain.

Encoders exist for each (filter-0 PNG, standard BMP/WAV plus the
variant writers used by tests) so tests can round-trip arbitrary
arrays.  Baseline+progressive JPEG lives in :mod:`ocr_ray.jpeg`; video
containers in :mod:`ocr_ray.avi` (MJPEG + uncompressed DIB) and
:mod:`ocr_ray.mkv` (Matroska V_MJPEG / V_UNCOMPRESSED).
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


def _bmp_palette(payload: bytes, bpp: int, clr_used: int, header_size: int) -> np.ndarray:
    n = clr_used or (1 << bpp)
    pal = np.frombuffer(
        payload[14 + header_size : 14 + header_size + 4 * n], dtype=np.uint8
    ).reshape(n, 4)
    return pal[:, 2::-1].copy()  # BGRx -> RGB


def _decode_rle8(data: bytes, width: int, height: int) -> np.ndarray:
    """BI_RLE8 -> [h, w] palette indices (bottom-up origin, like raw rows)."""
    out = np.zeros((height, width), dtype=np.uint8)
    x = y = pos = 0
    while pos + 1 < len(data):
        count, val = data[pos], data[pos + 1]
        pos += 2
        if count:  # encoded mode: run of `val`
            out[y, x : x + count] = val
            x += count
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            x += data[pos]
            y += data[pos + 1]
            pos += 2
        else:  # absolute mode: `val` literal indices, word-aligned
            out[y, x : x + val] = np.frombuffer(data[pos : pos + val], dtype=np.uint8)
            x += val
            pos += val + (val % 2)
    return out


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP -> [h, w, 3] uint8 RGB.

    Supports 24- and 32-bit uncompressed, 1/4/8-bit palette (BI_RGB) and
    8-bit RLE (BI_RLE8), per the public BITMAPINFOHEADER spec; other
    depth/compression combinations raise ``NotImplementedError``."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_offset,) = struct.unpack("<I", payload[10:14])
    (header_size,) = struct.unpack("<I", payload[14:18])
    width, height = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    (clr_used,) = struct.unpack("<I", payload[46:50]) if header_size >= 36 else (0,)
    flip = height > 0
    height = abs(height)

    if compression == 1 and bpp == 8:  # BI_RLE8
        pal = _bmp_palette(payload, bpp, clr_used, header_size)
        idx = _decode_rle8(payload[data_offset:], width, height)
        rgb = pal[idx]
        return rgb[::-1] if flip else rgb
    if compression != 0 or bpp not in (1, 4, 8, 24, 32):
        raise NotImplementedError("BMP {}bpp compression={}".format(bpp, compression))

    row_bytes = (width * bpp + 31) // 32 * 4
    rows = np.frombuffer(
        payload[data_offset : data_offset + row_bytes * height], dtype=np.uint8
    ).reshape(height, row_bytes)
    if flip:
        rows = rows[::-1]
    if bpp == 24:
        return rows[:, : width * 3].reshape(height, width, 3)[:, :, ::-1].copy()
    if bpp == 32:
        return rows.reshape(height, row_bytes // 4, 4)[:, :width, 2::-1].copy()
    pal = _bmp_palette(payload, bpp, clr_used, header_size)
    if bpp == 8:
        return pal[rows[:, :width]]
    bits = np.unpackbits(rows, axis=1)  # MSB-first, matching BMP bit order
    if bpp == 1:
        return pal[bits[:, :width]]
    nibbles = (bits.reshape(height, -1, 4) * [8, 4, 2, 1]).sum(axis=2)
    return pal[nibbles[:, :width].astype(np.uint8)]


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


def _bmp_header(w: int, h: int, bpp: int, compression: int, palette: np.ndarray | None,
                body: bytes) -> bytes:
    pal_bytes = b""
    n_pal = 0
    if palette is not None:
        n_pal = len(palette)
        bgrx = np.zeros((n_pal, 4), dtype=np.uint8)
        bgrx[:, :3] = palette[:, ::-1]
        pal_bytes = bgrx.tobytes()
    offset = 14 + 40 + len(pal_bytes)
    return (
        b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, compression,
                      len(body), 2835, 2835, n_pal, 0)
        + pal_bytes
    )


def encode_bmp_pal8(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """[h, w] uint8 palette indices + [n, 3] RGB palette -> 8-bit BMP."""
    idx = np.asarray(indices, dtype=np.uint8)
    h, w = idx.shape
    row_bytes = (w + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w] = idx[::-1]  # bottom-up
    body = rows.tobytes()
    return _bmp_header(w, h, 8, 0, np.asarray(palette, dtype=np.uint8), body) + body


def encode_bmp_rle8(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """[h, w] uint8 palette indices + [n, 3] RGB palette -> BI_RLE8 BMP
    (encoded-mode runs + end-of-line/bitmap markers)."""
    idx = np.asarray(indices, dtype=np.uint8)
    h, w = idx.shape
    out = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = idx[y]
        x = 0
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            out += bytes([run, row[x]])
            x += run
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    return _bmp_header(w, h, 8, 1, np.asarray(palette, dtype=np.uint8), bytes(out)) + bytes(out)


def encode_bmp32(img: np.ndarray) -> bytes:
    """[h, w, 3] uint8 RGB -> 32-bit uncompressed BMP (BGRx rows)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    rows = np.zeros((h, w, 4), dtype=np.uint8)
    rows[:, :, :3] = img[::-1, :, ::-1]
    return _bmp_header(w, h, 32, 0, None, rows.tobytes()) + rows.tobytes()


# --- G.711 companding (public ITU-T spec), vectorized ---------------------

def mulaw_expand(code: np.ndarray) -> np.ndarray:
    """u8 mu-law codes -> int16 linear (ITU-T G.711 u-law expansion)."""
    u = (~np.asarray(code, dtype=np.uint8)).astype(np.int32)
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def mulaw_compress(samples: np.ndarray) -> np.ndarray:
    """int16 linear -> u8 mu-law codes (ITU-T G.711, bias 0x84)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int32)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant)).astype(np.uint8)


def alaw_expand(code: np.ndarray) -> np.ndarray:
    """u8 A-law codes -> int16 linear (ITU-T G.711 A-law expansion)."""
    a = (np.asarray(code, dtype=np.uint8) ^ 0x55).astype(np.int32)
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1))
    return np.where(sign, mag, -mag).astype(np.int16)  # A-law: sign bit 1 = positive


def alaw_compress(samples: np.ndarray) -> np.ndarray:
    """int16 linear -> u8 A-law codes (ITU-T G.711)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x >= 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32767) >> 3  # 13-bit magnitude
    exp = np.maximum(np.floor(np.log2(np.maximum(mag, 1))).astype(np.int32) - 4, 0)
    mant = np.where(exp == 0, mag >> 1, (mag >> exp) & 0x0F)
    return ((sign | (exp << 4) | mant) ^ 0x55).astype(np.uint8)


_WAVE_PCM = 0x0001
_WAVE_FLOAT = 0x0003
_WAVE_ALAW = 0x0006
_WAVE_MULAW = 0x0007
_WAVE_EXTENSIBLE = 0xFFFE


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV -> ([n] or [n, ch] int16, sample_rate).

    Parses the RIFF fmt/data chunks directly (public WAVE spec) and
    normalizes every supported encoding to the int16 domain: PCM u8 /
    16 / 24 / 32-bit, IEEE float32/64, ITU G.711 A-law / mu-law, and
    WAVE_FORMAT_EXTENSIBLE wrapping any of those.  Unknown format tags
    raise ``NotImplementedError`` with the tag named."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV RIFF file")
    fmt = None
    data = None
    pos = 12
    while pos + 8 <= len(payload):
        cc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cc == b"fmt ":
            fmt = payload[body : body + size]
        elif cc == b"data":
            data = payload[body : body + size]
        pos = body + size + (size % 2)
    if fmt is None or data is None:
        raise ValueError("WAV is missing fmt or data chunk")

    tag, ch, sr, _brate, _align, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag == _WAVE_EXTENSIBLE:
        if len(fmt) < 40:
            raise ValueError("WAVE_FORMAT_EXTENSIBLE fmt chunk too short")
        (tag,) = struct.unpack_from("<H", fmt, 24)  # SubFormat GUID leads with the tag

    if tag == _WAVE_PCM and bits == 16:
        out = np.frombuffer(data[: len(data) & ~1], dtype="<i2").astype(np.int16)
    elif tag == _WAVE_PCM and bits == 8:
        out = ((np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) << 8)
    elif tag == _WAVE_PCM and bits == 24:
        b = np.frombuffer(data[: len(data) - len(data) % 3], dtype=np.uint8)
        b = b.reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)  # sign-extend
        out = (v >> 8).astype(np.int16)
    elif tag == _WAVE_PCM and bits == 32:
        out = (np.frombuffer(data[: len(data) & ~3], dtype="<i4") >> 16).astype(np.int16)
    elif tag == _WAVE_FLOAT and bits in (32, 64):
        dt = "<f4" if bits == 32 else "<f8"
        width = bits // 8
        f = np.frombuffer(data[: len(data) - len(data) % width], dtype=dt)
        out = np.round(np.clip(f, -1.0, 1.0) * 32767.0).astype(np.int16)
    elif tag == _WAVE_ALAW:
        out = alaw_expand(np.frombuffer(data, dtype=np.uint8))
    elif tag == _WAVE_MULAW:
        out = mulaw_expand(np.frombuffer(data, dtype=np.uint8))
    else:
        raise NotImplementedError(
            "WAV format tag 0x{:04x} / {} bits not supported (PCM 8/16/24/32, "
            "float32/64, A-law, mu-law are built in)".format(tag, bits)
        )
    if ch > 1:
        out = out[: len(out) - len(out) % ch].reshape(-1, ch)
    return out, sr


def encode_wav_fmt(samples: np.ndarray, sample_rate: int, fmt: str) -> bytes:
    """Encode int16 samples into a WAV variant for testing the decoder:
    fmt in {'u8', 'pcm16', 'pcm24', 'pcm32', 'f32', 'f64', 'alaw',
    'mulaw', 'ext16'} ('ext16' = WAVE_FORMAT_EXTENSIBLE wrapping PCM16)."""
    samples = np.asarray(samples, dtype=np.int16)
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    flat = samples.reshape(-1)
    if fmt == "u8":
        tag, bits, body = _WAVE_PCM, 8, ((flat.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
    elif fmt in ("pcm16", "ext16"):
        tag, bits, body = _WAVE_PCM, 16, flat.astype("<i2").tobytes()
    elif fmt == "pcm24":
        v = (flat.astype(np.int32) << 8) & 0xFFFFFF
        b = np.stack([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF], axis=-1)
        tag, bits, body = _WAVE_PCM, 24, b.astype(np.uint8).tobytes()
    elif fmt == "pcm32":
        tag, bits, body = _WAVE_PCM, 32, (flat.astype(np.int32) << 16).astype("<i4").tobytes()
    elif fmt in ("f32", "f64"):
        f = flat.astype(np.float64) / 32767.0
        tag = _WAVE_FLOAT
        bits = 32 if fmt == "f32" else 64
        body = f.astype("<f4" if fmt == "f32" else "<f8").tobytes()
    elif fmt == "alaw":
        tag, bits, body = _WAVE_ALAW, 8, alaw_compress(flat).tobytes()
    elif fmt == "mulaw":
        tag, bits, body = _WAVE_MULAW, 8, mulaw_compress(flat).tobytes()
    else:
        raise ValueError("unknown WAV test format {!r}".format(fmt))

    align = ch * bits // 8
    if fmt == "ext16":
        guid = struct.pack("<H", _WAVE_PCM) + b"\x00\x00" + bytes(
            [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
        )
        fmt_body = struct.pack(
            "<HHIIHHHH", _WAVE_EXTENSIBLE, ch, sample_rate,
            sample_rate * align, align, bits, 22, bits,
        ) + struct.pack("<I", 0x4 if ch == 1 else 0x3) + guid
    else:
        fmt_body = struct.pack(
            "<HHIIHH", tag, ch, sample_rate, sample_rate * align, align, bits
        )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + (b"\x00" if len(fmt_body) % 2 else b"")
        + b"data" + struct.pack("<I", len(body)) + body
        + (b"\x00" if len(body) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


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
