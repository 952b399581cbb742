"""Minimal AVI (RIFF) container for Motion-JPEG video, from scratch.

The reference streams video frames through OpenCV's container readers
(``utils/image/video_io`` / ``utils/image/image_io.py:181-389``); this
environment ships no ffmpeg/cv2, so the one video path we can make REAL end
to end is MJPEG-in-AVI: each frame is an ordinary baseline JPEG (decoded by
the from-scratch :mod:`ocr_ray.jpeg`), and the container is the public
Microsoft 'AVI ' RIFF form (avih / strl / movi / idx1 chunk layout).

Two codecs are implemented: MJPEG ('00dc' chunks of baseline JPEGs) and
uncompressed DIB ('00db' chunks: BGR bottom-up rows, biCompression=0) —
one 'vids' stream, even-byte chunk padding.  Anything else (compressed
non-MJPEG codecs, multiple streams, audio interleave, ODML extensions)
raises ``NotImplementedError`` honestly.  Matroska lives in
:mod:`ocr_ray.mkv`.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(frames, fps: int = 10, quality: int = 92) -> bytes:
    """Encode an iterable of [h, w, 3] uint8 frames as MJPEG-in-AVI."""
    return _encode_avi(frames, fps=fps, quality=quality, handler=b"MJPG")


def encode_avi_raw(frames, fps: int = 10) -> bytes:
    """Encode [h, w, 3] uint8 frames as uncompressed DIB-in-AVI ('00db'
    chunks: BGR, bottom-up rows padded to 4 bytes, biCompression=0)."""
    return _encode_avi(frames, fps=fps, quality=0, handler=b"DIB ")


def _dib_frame(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - w * 3)
    return b"".join(img[h - 1 - y, :, ::-1].tobytes() + pad for y in range(h))


def _encode_avi(frames, fps: int, quality: int, handler: bytes) -> bytes:
    from . import jpeg

    frames = [np.asarray(f) for f in frames]  # materialize once: generators ok
    if handler == b"MJPG":
        blobs = [jpeg.encode_jpeg(f, quality=quality) for f in frames]
        chunk_cc = b"00dc"
    else:
        blobs = [_dib_frame(f) for f in frames]
        chunk_cc = b"00db"
    if not blobs:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    max_bytes = max(len(b) for b in blobs)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,      # dwMicroSecPerFrame
        max_bytes * fps,       # dwMaxBytesPerSec
        0,                     # dwPaddingGranularity
        0x10,                  # dwFlags = AVIF_HASINDEX
        len(blobs),            # dwTotalFrames
        0, 1,                  # dwInitialFrames, dwStreams
        max_bytes,             # dwSuggestedBufferSize
        w, h,
        0, 0, 0, 0,            # dwReserved
    )
    strh = (
        b"vids" + handler
        + struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0,           # dwFlags, wPriority, wLanguage
            0,                 # dwInitialFrames
            1, fps,            # dwScale, dwRate
            0, len(blobs),     # dwStart, dwLength
            max_bytes,         # dwSuggestedBufferSize
            0xFFFFFFFF, 0,     # dwQuality, dwSampleSize
            0, 0, w, h,        # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24,
        b"MJPG" if handler == b"MJPG" else b"\x00\x00\x00\x00",  # biCompression
        max_bytes, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b"".join(_chunk(chunk_cc, b) for b in blobs)
    movi = _list(b"movi", movi_payload)

    idx, off = [], 4  # offsets are relative to the 'movi' fourcc
    for b in blobs:
        idx.append(struct.pack("<4sIII", chunk_cc, 0x10, off, len(b)))
        off += 8 + len(b) + (len(b) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx))

    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, list_type_or_None, payload_start, payload_size)."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if fourcc in (b"LIST", b"RIFF"):
            yield fourcc, buf[body : body + 4], body + 4, size - 4
        else:
            yield fourcc, None, body, size
        pos = body + size + (size % 2)


def _decode_dib(blob: bytes, w: int, h: int) -> np.ndarray:
    """One uncompressed DIB frame (BGR, bottom-up, 4-byte row pad) -> RGB."""
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(blob[: row_bytes * h], dtype=np.uint8).reshape(h, row_bytes)
    return rows[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1]


def decode_avi(payload: bytes) -> np.ndarray:
    """Decode an AVI video -> [n_frames, h, w, 3] uint8.

    Walks the RIFF chunk tree for the 'movi' list and decodes every video
    frame chunk (``..dc`` / ``..db``): MJPEG streams via
    :func:`ocr_ray.jpeg.decode_jpeg`, uncompressed DIB streams (handler
    ``DIB `` / zero, biCompression=0) via a vectorized BGR bottom-up
    unpack.  Compressed non-MJPEG codecs fail fast with the codec named.
    """
    from . import jpeg

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI RIFF file")

    handler = None
    strf_w = strf_h = strf_comp = None
    for fourcc, ltype, body, size in _walk_chunks(payload, 12, len(payload)):
        if fourcc == b"LIST" and ltype == b"hdrl":
            for f2, l2, b2, s2 in _walk_chunks(payload, body, body + size):
                if f2 == b"LIST" and l2 == b"strl":
                    is_vids = False
                    for f3, _, b3, s3 in _walk_chunks(payload, b2, b2 + s2):
                        if f3 == b"strh" and payload[b3 : b3 + 4] == b"vids":
                            handler = payload[b3 + 4 : b3 + 8]
                            is_vids = True
                        elif f3 == b"strf" and is_vids and s3 >= 40:
                            strf_w, strf_h = struct.unpack_from("<ii", payload, b3 + 4)
                            (strf_comp,) = struct.unpack_from("<I", payload, b3 + 16)
    mjpeg = handler is None or handler.upper() in (b"MJPG", b"JPEG")
    raw_dib = not mjpeg and (
        handler in (b"DIB ", b"\x00\x00\x00\x00") or strf_comp == 0
    )
    if not mjpeg and not raw_dib:
        raise NotImplementedError(
            "AVI video handler {!r} not supported (MJPEG and uncompressed "
            "DIB only; other codecs need ffmpeg, absent in this "
            "environment)".format(handler)
        )
    if raw_dib and (not strf_w or strf_h is None):
        raise ValueError("DIB AVI stream is missing its strf dimensions")

    def _frame(blob: bytes) -> np.ndarray:
        if mjpeg:
            return jpeg.decode_jpeg(blob)
        return _decode_dib(blob, strf_w, abs(strf_h))

    frames = []
    for fourcc, ltype, body, size in _walk_chunks(payload, 12, len(payload)):
        if fourcc == b"LIST" and ltype == b"movi":
            for f2, l2, b2, s2 in _walk_chunks(payload, body, body + size):
                if f2[2:4] in (b"dc", b"db"):
                    frames.append(_frame(payload[b2 : b2 + s2]))
                elif f2 == b"LIST" and l2 == b"rec ":
                    for f3, _, b3, s3 in _walk_chunks(payload, b2, b2 + s2):
                        if f3[2:4] in (b"dc", b"db"):
                            frames.append(_frame(payload[b3 : b3 + s3]))
    if not frames:
        raise ValueError("AVI contains no video frame chunks")
    return np.stack(frames)


# Back-compat name: the original MJPEG-only entry point now dispatches on
# the stream handler, so both names decode both supported codecs.
decode_avi_mjpeg = decode_avi
