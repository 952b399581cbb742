"""Golden-file corpus test (the assertReproductible pattern,
/root/reference/tests/__init__.py:78-83): per-url sha256 of the extracted
text, frozen at tests/golden/corpus_digests.json.  Any change to extraction
semantics must consciously regenerate the file
(``python -m tests.regen_golden``)."""

import json
import os

from ocr_ray import reference, synth

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "corpus_digests.json")
N, SEED = 120, 7


def compute_digests() -> dict:
    corpus = synth.synth_corpus(N, seed=SEED)
    out = reference.extract_table(corpus)
    return {
        u: {"digest": d, "status": s, "n_blocks": n}
        for u, d, s, n in zip(
            out.column("url").to_pylist(),
            out.column("digest").to_pylist(),
            out.column("status").to_pylist(),
            out.column("n_blocks").to_pylist(),
        )
    }


def test_golden_corpus():
    with open(GOLDEN) as f:
        expected = json.load(f)
    got = compute_digests()
    assert got == expected
