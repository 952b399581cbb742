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
        [multimodal.synth_media(48), multimodal.synth_media_real(20)]
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
        [multimodal.synth_media(48), multimodal.synth_media_real(20)]
    )
    out = multimodal.MediaFeatureExtractor()(table)
    return [
        {k: r[k] for k in ("media_id", "kind", "n_bytes", "mean", "std", "status")}
        for r in out.to_pylist()
    ]


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
