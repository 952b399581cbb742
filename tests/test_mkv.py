"""Matroska (EBML) container tests (ocr_ray.mkv): encode/decode
round-trips for V_MJPEG and V_UNCOMPRESSED, all three lacing modes,
EBML structure validity, multimodal dispatch, and honest failures for
foreign codecs.

The reference reads containers via cv2/ffmpeg (utils/image/image_io.py:
181-389) and ships Matroska helpers (utils/audio/mkv_utils.py); this is
the from-scratch RFC-8794/Matroska equivalent."""

import numpy as np
import pytest

from ocr_ray import mkv
from ocr_ray.stages import multimodal as mm


def _smooth_frames(nf, h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            np.stack(
                [
                    np.clip(x * 4 + 10 * f, 0, 255),
                    np.clip(y * 4, 0, 255),
                    np.clip((x + y) * 2, 0, 255),
                ],
                axis=-1,
            )
            for f in range(nf)
        ]
    ).astype(np.uint8)


def test_vint_roundtrip_all_lengths():
    for v in (0, 1, 126, 127, 128, 16382, 16383, 2**21 - 2, 2**28 - 2, 2**35 - 2):
        buf = mkv._write_vint(v)
        got, pos = mkv._read_vint(buf, 0)
        assert got == v and pos == len(buf)


def test_mjpeg_roundtrip():
    frames = _smooth_frames(5, 24, 32)
    dec = mkv.decode_mkv(mkv.encode_mkv(frames, fps=10, quality=95))
    assert dec.shape == frames.shape and dec.dtype == np.uint8
    assert np.abs(dec.astype(float) - frames.astype(float)).max() <= 6


@pytest.mark.parametrize("lacing", [None, "xiph", "ebml", "fixed"])
def test_uncompressed_exact_roundtrip_every_lacing(lacing):
    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, size=(7, 16, 16, 3), dtype=np.uint8)
    buf = mkv.encode_mkv(
        frames, codec="V_UNCOMPRESSED", lacing=lacing, cluster_frames=4
    )
    assert (mkv.decode_mkv(buf) == frames).all()


@pytest.mark.parametrize("lacing", ["xiph", "ebml"])
def test_variable_size_lacing_over_mjpeg(lacing):
    frames = _smooth_frames(5, 24, 32)
    buf = mkv.encode_mkv(frames, codec="V_MJPEG", lacing=lacing, cluster_frames=3)
    dec = mkv.decode_mkv(buf)
    assert dec.shape == frames.shape
    assert np.abs(dec.astype(float) - frames.astype(float)).max() <= 8


def test_ebml_structure():
    buf = mkv.encode_mkv(_smooth_frames(2, 8, 8))
    assert buf[:4] == b"\x1a\x45\xdf\xa3"
    tops = [eid for eid, _, _ in mkv._iter_elements(buf, 0, len(buf))]
    assert tops == [mkv.EBML_HEADER, mkv.SEGMENT]
    seg = next(
        (b, e) for eid, b, e in mkv._iter_elements(buf, 0, len(buf))
        if eid == mkv.SEGMENT
    )
    inner = [eid for eid, _, _ in mkv._iter_elements(buf, *seg)]
    assert inner[:2] == [mkv.INFO, mkv.TRACKS]
    assert all(e == mkv.CLUSTER for e in inner[2:]) and len(inner) > 2


def test_unknown_size_segment_decodes():
    # rewrite the Segment size vint as all-ones (unknown size, legal for
    # masters): the parser must extend it to the end of the file
    frames = _smooth_frames(2, 8, 8)
    buf = mkv.encode_mkv(frames, codec="V_UNCOMPRESSED")
    seg_id = mkv.SEGMENT.to_bytes(4, "big")
    at = buf.index(seg_id) + 4
    size, after = mkv._read_vint(buf, at)
    length = after - at
    unknown = ((1 << (7 * length)) - 1) | (1 << (7 * length))
    patched = buf[:at] + unknown.to_bytes(length, "big") + buf[after:]
    assert (mkv.decode_mkv(patched) == frames).all()


def test_rejects_non_mkv_and_foreign_codec():
    with pytest.raises(ValueError):
        mkv.decode_mkv(b"RIFF\x04\x00\x00\x00AVI ")
    buf = mkv.encode_mkv(_smooth_frames(2, 8, 8))
    patched = buf.replace(b"V_MJPEG", b"V_MPEG4")
    with pytest.raises(NotImplementedError, match="V_MPEG4"):
        mkv.decode_mkv(patched)
    with pytest.raises(NotImplementedError):
        mkv.encode_mkv(_smooth_frames(1, 8, 8), codec="V_VP8")


def test_multitrack_filters_to_video_and_blockgroup_decodes():
    # hand-assemble a Segment with an audio TrackEntry FIRST, the video
    # track second (track number 2), video frames split across a
    # SimpleBlock and a BlockGroup/Block, plus interleaved audio blocks
    # that must be ignored
    rng = np.random.RandomState(13)
    frames = rng.randint(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    audio_entry = mkv._elem(
        mkv.TRACK_ENTRY,
        mkv._uint(mkv.TRACK_NUMBER, 1)
        + mkv._uint(mkv.TRACK_UID, 1)
        + mkv._uint(mkv.TRACK_TYPE, 2)  # audio
        + mkv._string(mkv.CODEC_ID, "A_PCM/INT/LIT"),
    )
    video_entry = mkv._elem(
        mkv.TRACK_ENTRY,
        mkv._uint(mkv.TRACK_NUMBER, 2)
        + mkv._uint(mkv.TRACK_UID, 2)
        + mkv._uint(mkv.TRACK_TYPE, 1)
        + mkv._string(mkv.CODEC_ID, "V_UNCOMPRESSED")
        + mkv._elem(
            mkv.VIDEO,
            mkv._uint(mkv.PIXEL_WIDTH, 8) + mkv._uint(mkv.PIXEL_HEIGHT, 8)
            + mkv._elem(mkv.COLOUR_SPACE, b"RGB3"),
        ),
    )
    import struct as _s

    def sb(track, body):
        return mkv._elem(
            mkv.SIMPLE_BLOCK,
            mkv._write_vint(track) + _s.pack(">h", 0) + bytes([0x80]) + body,
        )

    cluster = mkv._elem(
        mkv.CLUSTER,
        mkv._uint(mkv.CLUSTER_TS, 0)
        + sb(1, b"\x00" * 32)              # audio: must be skipped
        + sb(2, frames[0].tobytes())        # video SimpleBlock
        + mkv._elem(                        # video via BlockGroup/Block
            mkv.BLOCK_GROUP,
            mkv._elem(
                mkv.BLOCK,
                mkv._write_vint(2) + _s.pack(">h", 100) + bytes([0x00])
                + frames[1].tobytes(),
            ),
        )
        + sb(1, b"\x00" * 32),
    )
    buf = mkv._ebml_header() + mkv._elem(
        mkv.SEGMENT,
        mkv._elem(mkv.INFO, mkv._uint(mkv.TIMESTAMP_SCALE, 1_000_000))
        + mkv._elem(mkv.TRACKS, audio_entry + video_entry)
        + cluster,
    )
    assert (mkv.decode_mkv(buf) == frames).all()


def test_multimodal_dispatch_decodes_mkv():
    frames = _smooth_frames(3, 16, 16)
    buf = mkv.encode_mkv(frames, codec="V_UNCOMPRESSED", lacing="fixed")
    assert (mm.decode_media(buf) == frames).all()
    assert (mm.decode_real(buf) == frames).all()


def test_frame_sampler_walks_mkv(ray_session):
    import pyarrow as pa
    import ray

    frames = _smooth_frames(6, 8, 8)
    table = pa.Table.from_pylist(
        [
            {
                "media_id": 1,
                "kind": "video",
                "payload": mkv.encode_mkv(frames, codec="V_UNCOMPRESSED"),
                "width": 8,
                "height": 8,
                "sample_rate": 0,
                "n_frames": 6,
            }
        ],
        schema=mm.MEDIA,
    )
    out = mm.video_frames(ray.data.from_arrow(table), concurrency=1).to_pandas()
    assert list(out["frame_index"]) == list(range(0, 6, mm.FRAME_STRIDE))
    assert (out["status"] == "ok").all()
