"""Minimal AVI (RIFF) container for Motion-JPEG video, from scratch.

The reference streams video frames through OpenCV's container readers
(``utils/image/video_io`` / ``utils/image/image_io.py:181-389``); this
environment ships no ffmpeg/cv2, so the one video path we can make REAL end
to end is MJPEG-in-AVI: each frame is an ordinary baseline JPEG (decoded by
the from-scratch :mod:`ocr_ray.jpeg`), and the container is the public
Microsoft 'AVI ' RIFF form (avih / strl / movi / idx1 chunk layout).

Only what MJPEG needs is implemented: one 'vids' stream, '00dc' frame
chunks, even-byte chunk padding.  Anything else (multiple streams, audio
interleave, ODML extensions) raises ``NotImplementedError`` honestly.
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
    from . import jpeg

    frames = [np.asarray(f) for f in frames]  # materialize once: generators ok
    blobs = [jpeg.encode_jpeg(f, quality=quality) for f in frames]
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
        b"vids" + b"MJPG"
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
        40, w, h, 1, 24, b"MJPG", max_bytes, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b"".join(_chunk(b"00dc", b) for b in blobs)
    movi = _list(b"movi", movi_payload)

    idx, off = [], 4  # offsets are relative to the 'movi' fourcc
    for b in blobs:
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(b)))
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


def decode_avi_mjpeg(payload: bytes) -> np.ndarray:
    """Decode MJPEG-in-AVI -> [n_frames, h, w, 3] uint8.

    Walks the RIFF chunk tree for the 'movi' list and decodes every video
    frame chunk (``..dc`` / ``..db``) with :func:`ocr_ray.jpeg.decode_jpeg`.
    Non-MJPEG streams fail fast with the codec named.
    """
    from . import jpeg

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI RIFF file")

    handler = None
    for fourcc, ltype, body, size in _walk_chunks(payload, 12, len(payload)):
        if fourcc == b"LIST" and ltype == b"hdrl":
            for f2, l2, b2, s2 in _walk_chunks(payload, body, body + size):
                if f2 == b"LIST" and l2 == b"strl":
                    for f3, _, b3, s3 in _walk_chunks(payload, b2, b2 + s2):
                        if f3 == b"strh" and payload[b3 : b3 + 4] == b"vids":
                            handler = payload[b3 + 4 : b3 + 8]
    if handler is not None and handler.upper() not in (b"MJPG", b"JPEG"):
        raise NotImplementedError(
            "AVI video handler {!r} not supported (MJPEG only; other codecs "
            "need ffmpeg, absent in this environment)".format(handler)
        )

    frames = []
    for fourcc, ltype, body, size in _walk_chunks(payload, 12, len(payload)):
        if fourcc == b"LIST" and ltype == b"movi":
            for f2, l2, b2, s2 in _walk_chunks(payload, body, body + size):
                if f2[2:4] in (b"dc", b"db"):
                    frames.append(jpeg.decode_jpeg(payload[b2 : b2 + s2]))
                elif f2 == b"LIST" and l2 == b"rec ":
                    for f3, _, b3, s3 in _walk_chunks(payload, b2, b2 + s2):
                        if f3[2:4] in (b"dc", b"db"):
                            frames.append(jpeg.decode_jpeg(payload[b3 : b3 + s3]))
    if not frames:
        raise ValueError("AVI contains no video frame chunks")
    return np.stack(frames)
