"""Minimal Matroska (MKV/EBML) container for video frames, from scratch.

The reference reads arbitrary video containers through OpenCV/ffmpeg
(utils/image/image_io.py:181-389) and ships Matroska helpers
(utils/audio/mkv_utils.py built on ffmpeg probes); this environment has
neither, so the container layer itself is implemented directly from the
public EBML (RFC 8794) and Matroska specifications:

- EBML: variable-length integers for element IDs and sizes, master
  elements as nested byte ranges, unknown-size masters extending to the
  parent's end.
- Matroska: EBML header (DocType ``matroska``) + Segment containing
  Info (TimestampScale), Tracks (TrackEntry: TrackNumber / TrackType /
  CodecID / Video{PixelWidth, PixelHeight, ColourSpace}) and Clusters of
  SimpleBlocks.  All three lacing modes (Xiph, fixed-size, EBML) are
  decoded per spec.

Two codecs are REAL end to end: ``V_MJPEG`` (each frame an ordinary
baseline JPEG, decoded by the from-scratch :mod:`ocr_ray.jpeg`) and
``V_UNCOMPRESSED`` (packed 24-bit frames, ColourSpace FourCC ``RGB3`` /
``BGR3`` as in V4L2).  Any other CodecID (V_MPEG4/*, V_VP8, ...) raises
``NotImplementedError`` naming the codec — those need ffmpeg, absent in
this environment.
"""

from __future__ import annotations

import struct

import numpy as np

# --- EBML element IDs (stored with their marker bits, per RFC 8794) ------
EBML_HEADER = 0x1A45DFA3
DOCTYPE = 0x4282
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMESTAMP_SCALE = 0x2AD7B1
MUX_APP = 0x4D80
WRITE_APP = 0x5741
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_UID = 0x73C5
TRACK_TYPE = 0x83
CODEC_ID = 0x86
DEFAULT_DURATION = 0x23E383
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
COLOUR_SPACE = 0x2EB524
CLUSTER = 0x1F43B675
CLUSTER_TS = 0xE7
SIMPLE_BLOCK = 0xA3
BLOCK_GROUP = 0xA0
BLOCK = 0xA1

_MASTERS = {EBML_HEADER, SEGMENT, INFO, TRACKS, TRACK_ENTRY, VIDEO,
            CLUSTER, BLOCK_GROUP}


# --- vints ----------------------------------------------------------------

def _write_vint(value: int) -> bytes:
    """Encode a size/track-number vint in its minimal length."""
    for length in range(1, 9):
        if value < (1 << (7 * length)) - 1:  # all-ones means unknown size
            return (value | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError("vint out of range: {}".format(value))


def _read_vint(buf: bytes, pos: int) -> tuple[int | None, int]:
    """Read a size vint -> (value or None for unknown-size, next_pos)."""
    first = buf[pos]
    if first == 0:
        raise ValueError("invalid EBML vint (leading byte 0)")
    length = 9 - first.bit_length()
    raw = int.from_bytes(buf[pos : pos + length], "big")
    value = raw & ((1 << (7 * length)) - 1)
    if value == (1 << (7 * length)) - 1:
        return None, pos + length  # unknown size
    return value, pos + length


def _read_id(buf: bytes, pos: int) -> tuple[int, int]:
    """Read an element ID (marker bits KEPT, per convention)."""
    first = buf[pos]
    if first == 0:
        raise ValueError("invalid EBML element ID")
    length = 9 - first.bit_length()
    if length > 4:
        raise ValueError("EBML ID longer than 4 bytes")
    return int.from_bytes(buf[pos : pos + length], "big"), pos + length


def _iter_elements(buf: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) walking one master level.

    Unknown-size elements (only legal for masters) extend to ``end``."""
    while pos < end:
        eid, pos = _read_id(buf, pos)
        size, pos = _read_vint(buf, pos)
        if size is None:
            yield eid, pos, end
            return
        yield eid, pos, min(pos + size, end)
        pos += size


# --- element writers -------------------------------------------------------

def _elem(eid: int, payload: bytes) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big") + _write_vint(len(payload)) + payload


def _uint(eid: int, value: int) -> bytes:
    return _elem(eid, value.to_bytes(max(1, (value.bit_length() + 7) // 8), "big"))


def _string(eid: int, s: str) -> bytes:
    return _elem(eid, s.encode("utf-8"))


def _ebml_header() -> bytes:
    return _elem(
        EBML_HEADER,
        _uint(0x4286, 1)          # EBMLVersion
        + _uint(0x42F7, 1)        # EBMLReadVersion
        + _uint(0x42F2, 4)        # EBMLMaxIDLength
        + _uint(0x42F3, 8)        # EBMLMaxSizeLength
        + _string(DOCTYPE, "matroska")
        + _uint(0x4287, 4)        # DocTypeVersion
        + _uint(0x4285, 2),       # DocTypeReadVersion
    )


def _simple_block(track: int, rel_ts: int, flags: int, body: bytes) -> bytes:
    return _elem(SIMPLE_BLOCK, _write_vint(track) + struct.pack(">h", rel_ts)
                 + bytes([flags]) + body)


def _lace_xiph_sizes(sizes: list[int]) -> bytes:
    out = bytearray([len(sizes) - 1])
    for s in sizes[:-1]:  # last frame's size is implicit
        while s >= 255:
            out.append(255)
            s -= 255
        out.append(s)
    return bytes(out)


def _lace_ebml_sizes(sizes: list[int]) -> bytes:
    out = bytearray([len(sizes) - 1])
    out += _write_vint(sizes[0])
    prev = sizes[0]
    for s in sizes[1:-1]:  # deltas, signed-vint biased by 2^(7L-1)-1
        delta = s - prev
        for length in range(1, 9):
            bias = (1 << (7 * length - 1)) - 1
            if -bias <= delta < bias:
                # write at EXACTLY this length: the decoder derives the
                # bias from the stored vint length
                out += ((delta + bias) | (1 << (7 * length))).to_bytes(length, "big")
                break
        prev = s
    return bytes(out)


def encode_mkv(
    frames,
    fps: int = 10,
    codec: str = "V_MJPEG",
    quality: int = 92,
    lacing: str | None = None,
    cluster_frames: int = 16,
) -> bytes:
    """Encode [h, w, 3] uint8 frames as a Matroska file.

    codec: ``V_MJPEG`` (frames become baseline JPEGs) or
    ``V_UNCOMPRESSED`` (packed RGB, ColourSpace ``RGB3``).
    lacing: None (one SimpleBlock per frame), ``xiph``, ``ebml`` or
    ``fixed`` (all frames of a cluster laced into one SimpleBlock —
    ``fixed`` requires equal frame sizes, i.e. V_UNCOMPRESSED)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]

    if codec == "V_MJPEG":
        from . import jpeg

        blobs = [jpeg.encode_jpeg(f, quality=quality) for f in frames]
        video = _uint(PIXEL_WIDTH, w) + _uint(PIXEL_HEIGHT, h)
    elif codec == "V_UNCOMPRESSED":
        blobs = [f.tobytes() for f in frames]
        video = (_uint(PIXEL_WIDTH, w) + _uint(PIXEL_HEIGHT, h)
                 + _elem(COLOUR_SPACE, b"RGB3"))
    else:
        raise NotImplementedError("encode_mkv codec {!r}".format(codec))

    track_entry = _elem(
        TRACK_ENTRY,
        _uint(TRACK_NUMBER, 1)
        + _uint(TRACK_UID, 1)
        + _uint(TRACK_TYPE, 1)  # video
        + _string(CODEC_ID, codec)
        + _uint(DEFAULT_DURATION, 1_000_000_000 // fps)
        + _elem(VIDEO, video),
    )
    info = _elem(
        INFO,
        _uint(TIMESTAMP_SCALE, 1_000_000)  # 1 ms ticks
        + _string(MUX_APP, "ocr_ray")
        + _string(WRITE_APP, "ocr_ray"),
    )

    clusters = b""
    for c0 in range(0, len(blobs), cluster_frames):
        group = blobs[c0 : c0 + cluster_frames]
        base_ts = c0 * 1000 // fps
        body = _uint(CLUSTER_TS, base_ts)
        if lacing is None or len(group) == 1:
            for i, blob in enumerate(group):
                rel = (c0 + i) * 1000 // fps - base_ts
                body += _simple_block(1, rel, 0x80, blob)
        else:
            sizes = [len(b) for b in group]
            if lacing == "xiph":
                body += _simple_block(1, 0, 0x80 | 0x02,
                                      _lace_xiph_sizes(sizes) + b"".join(group))
            elif lacing == "ebml":
                body += _simple_block(1, 0, 0x80 | 0x06,
                                      _lace_ebml_sizes(sizes) + b"".join(group))
            elif lacing == "fixed":
                if len(set(sizes)) != 1:
                    raise ValueError("fixed lacing needs equal frame sizes")
                body += _simple_block(1, 0, 0x80 | 0x04,
                                      bytes([len(group) - 1]) + b"".join(group))
            else:
                raise ValueError("unknown lacing {!r}".format(lacing))
        clusters += _elem(CLUSTER, body)

    return _ebml_header() + _elem(SEGMENT, info + _elem(TRACKS, track_entry) + clusters)


# --- decode ----------------------------------------------------------------

def _split_laces(buf: bytes, pos: int, end: int, flags: int) -> list[bytes]:
    """Split a (Simple)Block body after the track/ts/flags prefix into the
    laced frame payloads, per the Matroska lacing spec."""
    mode = flags & 0x06
    if mode == 0x00:
        return [buf[pos:end]]
    n_laces = buf[pos] + 1
    pos += 1
    sizes: list[int] = []
    if mode == 0x02:  # Xiph: 255-saturated byte sums, last implicit
        for _ in range(n_laces - 1):
            s = 0
            while True:
                b = buf[pos]
                pos += 1
                s += b
                if b != 255:
                    break
            sizes.append(s)
    elif mode == 0x04:  # fixed-size: equal split of the remainder
        total = end - pos
        if total % n_laces:
            raise ValueError("fixed lacing remainder not divisible")
        sizes = [total // n_laces] * (n_laces - 1)
    else:  # 0x06 EBML: first absolute vint, then signed-vint deltas
        first, pos = _read_vint(buf, pos)
        if first is None:
            raise ValueError("unknown-size lace")
        sizes.append(first)
        prev = first
        for _ in range(n_laces - 2):
            length = 9 - buf[pos].bit_length()
            raw, pos = _read_vint(buf, pos)
            if raw is None:
                raise ValueError("unknown-size lace delta")
            prev += raw - ((1 << (7 * length - 1)) - 1)
            sizes.append(prev)
    frames = []
    for s in sizes:
        frames.append(buf[pos : pos + s])
        pos += s
    frames.append(buf[pos:end])  # last lace: the remainder
    return frames


def _block_frames(buf: bytes, pos: int, end: int, want_track: int) -> list[bytes]:
    track, pos = _read_vint(buf, pos)
    flags = buf[pos + 2]
    pos += 3  # int16 relative timestamp + flags byte
    if track != want_track:
        return []
    return _split_laces(buf, pos, end, flags)


def decode_mkv(payload: bytes) -> np.ndarray:
    """Decode a Matroska video file -> [n_frames, h, w, 3] uint8.

    Handles V_MJPEG (via :mod:`ocr_ray.jpeg`) and V_UNCOMPRESSED
    (``RGB3`` / ``BGR3`` ColourSpace); other CodecIDs raise
    ``NotImplementedError`` with the codec named."""
    if payload[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("not an EBML/Matroska file")

    segment = None
    for eid, body, bend in _iter_elements(payload, 0, len(payload)):
        if eid == EBML_HEADER:
            for e2, b2, e2end in _iter_elements(payload, body, bend):
                if e2 == DOCTYPE:
                    doctype = payload[b2:e2end].rstrip(b"\x00").decode("utf-8")
                    if doctype not in ("matroska", "webm"):
                        raise ValueError("EBML DocType {!r} is not Matroska".format(doctype))
        elif eid == SEGMENT:
            segment = (body, bend)
    if segment is None:
        raise ValueError("Matroska file has no Segment")

    codec = track_no = None
    w = h = 0
    colourspace = b""
    cluster_spans = []
    for eid, body, bend in _iter_elements(payload, *segment):
        if eid == TRACKS and codec is None:
            for e2, b2, e2end in _iter_elements(payload, body, bend):
                if e2 != TRACK_ENTRY:
                    continue
                fields: dict[int, tuple[int, int]] = {}
                for e3, b3, e3end in _iter_elements(payload, b2, e2end):
                    fields[e3] = (b3, e3end)
                    if e3 == VIDEO:
                        for e4, b4, e4end in _iter_elements(payload, b3, e3end):
                            fields[e4] = (b4, e4end)
                ttype = fields.get(TRACK_TYPE)
                if ttype is None or payload[ttype[0]] != 1:
                    continue  # not a video track
                codec = payload[slice(*fields[CODEC_ID])].decode("utf-8")
                track_no = int.from_bytes(payload[slice(*fields[TRACK_NUMBER])], "big")
                w = int.from_bytes(payload[slice(*fields[PIXEL_WIDTH])], "big")
                h = int.from_bytes(payload[slice(*fields[PIXEL_HEIGHT])], "big")
                if COLOUR_SPACE in fields:
                    colourspace = payload[slice(*fields[COLOUR_SPACE])]
                break
        elif eid == CLUSTER:
            cluster_spans.append((body, bend))
    if codec is None:
        raise ValueError("Matroska file has no video track")
    if codec not in ("V_MJPEG", "V_UNCOMPRESSED"):
        raise NotImplementedError(
            "Matroska codec {!r} not supported (V_MJPEG / V_UNCOMPRESSED are "
            "built in; other codecs need ffmpeg, absent in this "
            "environment)".format(codec)
        )
    if codec == "V_UNCOMPRESSED" and colourspace not in (b"RGB3", b"BGR3"):
        raise NotImplementedError(
            "V_UNCOMPRESSED ColourSpace {!r} not supported (RGB3/BGR3 "
            "only)".format(colourspace)
        )

    blobs: list[bytes] = []
    for cbody, cend in cluster_spans:
        for eid, body, bend in _iter_elements(payload, cbody, cend):
            if eid == SIMPLE_BLOCK:
                blobs.extend(_block_frames(payload, body, bend, track_no))
            elif eid == BLOCK_GROUP:
                for e2, b2, e2end in _iter_elements(payload, body, bend):
                    if e2 == BLOCK:
                        blobs.extend(_block_frames(payload, b2, e2end, track_no))
    if not blobs:
        raise ValueError("Matroska file contains no video blocks")

    if codec == "V_MJPEG":
        from . import jpeg

        return np.stack([jpeg.decode_jpeg(b) for b in blobs])
    frames = np.stack(
        [np.frombuffer(b, dtype=np.uint8).reshape(h, w, 3) for b in blobs]
    )
    if colourspace == b"BGR3":
        frames = frames[..., ::-1]
    return frames
