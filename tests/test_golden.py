"""Golden-file corpus test (the assertReproductible pattern,
/root/reference/tests/__init__.py:78-83): per-url sha256 of the extracted
text, frozen at tests/golden/corpus_digests.json.  Any change to extraction
semantics must consciously regenerate the file
(``python -m tests.regen_golden``)."""

import json
import os

from ocr_ray import reference, synth

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
GOLDEN = os.path.join(GOLDEN_DIR, "corpus_digests.json")
# (n_pages, seed) per golden file — two seeds widen the regression surface
CONFIGS = {
    "corpus_digests.json": (120, 7),
    "corpus_digests_seed11.json": (96, 11),
}


def compute_digests(n: int = 120, seed: int = 7) -> dict:
    corpus = synth.synth_corpus(n, seed=seed)
    out = reference.extract_table(corpus)
    return {
        u: {"digest": d, "status": s, "n_blocks": n_b}
        for u, d, s, n_b in zip(
            out.column("url").to_pylist(),
            out.column("digest").to_pylist(),
            out.column("status").to_pylist(),
            out.column("n_blocks").to_pylist(),
        )
    }


def test_golden_corpus():
    for fname, (n, seed) in CONFIGS.items():
        with open(os.path.join(GOLDEN_DIR, fname)) as f:
            expected = json.load(f)
        assert compute_digests(n, seed) == expected, fname


def test_corpus_chrome_free():
    """FIXTURES invariant 4: no chrome strings from any archetype survive
    into any extracted text, corpus-wide."""
    from ocr_ray.synth import CHROME_ASIDE, CHROME_FOOTER, CHROME_HEADER

    corpus = synth.synth_corpus(120, seed=7)
    out = reference.extract_table(corpus)
    for url, text, status in zip(
        out.column("url").to_pylist(),
        out.column("extracted").to_pylist(),
        out.column("status").to_pylist(),
    ):
        if status != "ok":
            continue
        for chrome in (CHROME_HEADER, CHROME_FOOTER, CHROME_ASIDE, "navlink"):
            assert chrome not in text, (url, chrome)
