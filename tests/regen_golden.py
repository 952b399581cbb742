"""Regenerate the golden corpus digests and media-feature rows:
``python -m tests.regen_golden``.

The goldens pin behavior byte-for-byte: the extraction digests feed the
extract_archetypes VALUES-literal oracle, and media_features.json feeds
the media_features VALUES-literal oracle — regenerating them is a
conscious act, so any codec/extractor change must pass review here."""

import json
import os

from .test_golden import CONFIGS, GOLDEN_DIR, compute_digests


def compute_audio_mel_rows():
    """Deterministic log-mel feature rows over the audio subset of the
    same media table (the audio_mel query's VALUES-oracle source)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ocr_ray.stages import multimodal

    table = pa.concat_tables(
        [multimodal.synth_media(48), multimodal.synth_media_real(20),
         multimodal.synth_media_exotic(30)]
    )
    table = table.filter(pc.equal(table.column("kind"), "audio"))
    out = multimodal.AudioMelExtractor()(table)
    keys = ("media_id", "sample_rate", "n_samples", "n_frames", "n_trimmed",
            "mel_mean", "mel_std", "peak_band", "status")
    return [{k: r[k] for k in keys} for r in out.to_pylist()]


def compute_media_rows():
    """Deterministic media feature rows (media_id, kind, n_bytes, mean,
    std, status) over the same table the media_features query runs on."""
    import pyarrow as pa

    from ocr_ray.stages import multimodal

    table = pa.concat_tables(
        [multimodal.synth_media(48), multimodal.synth_media_real(20),
         multimodal.synth_media_exotic(30)]
    )
    out = multimodal.MediaFeatureExtractor()(table)
    return [
        {k: r[k] for k in ("media_id", "kind", "n_bytes", "mean", "std", "status")}
        for r in out.to_pylist()
    ]


def compute_phash_pairs():
    """Deterministic verified near-dup pairs over the planted image
    corpus (the image_phash_dedup query's VALUES-oracle source) —
    computed WITHOUT Ray: hash every image, enumerate band-colliding
    pairs, keep hamming <= T, exactly the distributed plan's contract."""
    import numpy as np

    from ocr_ray.stages import multimodal as M

    tbl = M.synth_images_neardup(36)
    dct = M.dct_matrix(32)
    hs = {
        mid: np.uint64(M.phash64(M.decode_real(p), dct))
        for mid, p in zip(
            tbl.column("media_id").to_pylist(), tbl.column("payload").to_pylist()
        )
    }
    pairs = []
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            collide = any(
                (hs[a] >> np.uint64(16 * k)) & np.uint64(0xFFFF)
                == (hs[b] >> np.uint64(16 * k)) & np.uint64(0xFFFF)
                for k in range(M.PHASH_BANDS)
            )
            if not collide:
                continue
            ham = int(bin(int(hs[a] ^ hs[b])).count("1"))
            if ham <= M.PHASH_HAMMING_T:
                pairs.append({"a": a, "b": b, "hamming": ham})
    return pairs


def compute_video_frame_rows():
    """Deterministic per-frame rows over the video subset of the media
    table (the video_frames query's VALUES-oracle source)."""
    import pyarrow as pa

    from ocr_ray.stages import multimodal

    table = pa.concat_tables(
        [multimodal.synth_media(48), multimodal.synth_media_real(20),
         multimodal.synth_media_exotic(30)]
    )
    out = multimodal.FrameSampler()(table)
    keys = ("media_id", "frame_index", "mean", "std", "status")
    return [{k: r[k] for k in keys} for r in out.to_pylist()]


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for fname, (n, seed) in CONFIGS.items():
        path = os.path.join(GOLDEN_DIR, fname)
        with open(path, "w") as f:
            json.dump(compute_digests(n, seed), f, indent=1, sort_keys=True)
        print("wrote", path)
    path = os.path.join(GOLDEN_DIR, "media_features.json")
    with open(path, "w") as f:
        json.dump(compute_media_rows(), f, indent=1, sort_keys=True)
    print("wrote", path)
    path = os.path.join(GOLDEN_DIR, "audio_mel.json")
    with open(path, "w") as f:
        json.dump(compute_audio_mel_rows(), f, indent=1, sort_keys=True)
    print("wrote", path)
    path = os.path.join(GOLDEN_DIR, "image_phash.json")
    with open(path, "w") as f:
        json.dump(compute_phash_pairs(), f, indent=1, sort_keys=True)
    print("wrote", path)
    path = os.path.join(GOLDEN_DIR, "video_frames.json")
    with open(path, "w") as f:
        json.dump(compute_video_frame_rows(), f, indent=1, sort_keys=True)
    print("wrote", path)
