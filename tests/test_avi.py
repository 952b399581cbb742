"""MJPEG-in-AVI container tests (ocr_ray.avi): encode/decode round-trips,
RIFF structure validity, multimodal dispatch, and honest failures for
non-MJPEG codecs.

The reference streams video via cv2 container readers
(utils/image/image_io.py:181-389); this is the from-scratch RIFF/MJPEG
equivalent built on the ocr_ray.jpeg baseline codec."""

import struct

import numpy as np
import pytest

from ocr_ray import avi
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


def test_roundtrip_smooth_video():
    frames = _smooth_frames(4, 24, 32)
    dec = avi.decode_avi_mjpeg(avi.encode_avi_mjpeg(frames, fps=10, quality=95))
    assert dec.shape == frames.shape and dec.dtype == np.uint8
    assert np.abs(dec.astype(float) - frames.astype(float)).max() <= 6


def test_riff_structure_and_index():
    frames = _smooth_frames(3, 8, 8)
    buf = avi.encode_avi_mjpeg(frames, fps=25)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"AVI "
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    assert 8 + riff_size + (riff_size % 2) == len(buf)
    # every declared chunk boundary must land inside the file
    kinds = [f for f, _, _, _ in avi._walk_chunks(buf, 12, len(buf))]
    assert kinds == [b"LIST", b"LIST", b"idx1"]
    # idx1 offsets point at '00dc' fourccs relative to the movi list type
    movi = next(
        (body, size)
        for f, lt, body, size in avi._walk_chunks(buf, 12, len(buf))
        if f == b"LIST" and lt == b"movi"
    )
    idx1 = next(
        buf[body : body + size]
        for f, _, body, size in avi._walk_chunks(buf, 12, len(buf))
        if f == b"idx1"
    )
    assert len(idx1) == 16 * 3
    for i in range(3):
        cc, flags, off, _ = struct.unpack_from("<4sIII", idx1, 16 * i)
        assert cc == b"00dc" and flags == 0x10
        assert buf[movi[0] - 4 + off : movi[0] - 4 + off + 4] == b"00dc"


def test_single_frame_and_gray_frames():
    # single color frame
    frames = _smooth_frames(1, 16, 16)
    assert avi.decode_avi_mjpeg(avi.encode_avi_mjpeg(frames)).shape == (1, 16, 16, 3)


def test_rejects_non_avi_and_foreign_codec():
    with pytest.raises(ValueError):
        avi.decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    # forge an AVI advertising an h264 handler: must fail fast, named
    frames = _smooth_frames(2, 8, 8)
    buf = bytearray(avi.encode_avi_mjpeg(frames))
    pos = buf.find(b"vidsMJPG")
    assert pos > 0
    buf[pos + 4 : pos + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        avi.decode_avi_mjpeg(bytes(buf))
    with pytest.raises(ValueError):
        avi.encode_avi_mjpeg([])


def test_multimodal_dispatch_decodes_avi():
    frames = _smooth_frames(2, 8, 16)
    arr = mm.decode_real(avi.encode_avi_mjpeg(frames, quality=95))
    assert arr.shape == (2, 8, 16, 3)
    # frame sampling over the decoded video
    assert mm.sample_frames(arr, 1).shape == (1, 8, 16, 3)


def test_synth_media_real_includes_video(ray_session):
    import ray.data

    tbl = mm.synth_media_real(n=18)
    kinds = set(tbl.column("kind").to_pylist())
    assert "video" in kinds
    feats = mm.media_features(
        ray.data.from_arrow(tbl), concurrency=2, batch_size=6
    ).take_all()
    vids = [r for r in feats if r["kind"] == "video"]
    assert vids and all(r["status"] == "ok" for r in vids)
    assert all(r["n_bytes"] > 0 and 0 <= r["mean"] <= 255 for r in vids)
