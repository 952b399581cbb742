"""Single-process oracle extractor (no Ray) for golden-file tests.

Runs the exact same :func:`ocr_ray.extract_core.extract_page` over a pages
table sequentially, in row order — the analog of the reference's
record-at-a-time Stream loop (models/interfaces/base_model.py:678-712).
The Ray pipeline's output, sorted by url, must be byte-identical to this
(FIXTURES.md invariant 1-2; cf. the reference's assertReproductible golden
pattern, tests/__init__.py:78-83).
"""

from __future__ import annotations

import pyarrow as pa

from .extract_core import extract_page
from .schema import EXTRACTED, EXTRACTED_FULL


def extract_table(
    pages: pa.Table, *, footnote_mode: str = "keep", include_paragraphs: bool = False
) -> pa.Table:
    urls = pages.column("url").to_pylist()
    payloads = pages.column("html").to_pylist()
    langs = (
        pages.column("lang").to_pylist() if "lang" in pages.column_names else [""] * len(urls)
    )
    rows = [
        extract_page(
            u, p, lang=l, footnote_mode=footnote_mode,
            include_paragraphs=include_paragraphs,
        )
        for u, p, l in zip(urls, payloads, langs)
    ]
    return pa.Table.from_pylist(
        rows, schema=EXTRACTED_FULL if include_paragraphs else EXTRACTED
    )
