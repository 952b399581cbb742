"""Explicit Arrow schemas for every stage boundary.

The reference flows implicit row dicts (cf. /root/reference
models/detection/base_detector.py:79-81, utils/text/parsers/__init__.py:99-128).
Here every stage boundary is a fixed ``pyarrow.Schema`` so golden-file tests can
compare byte-identically and the streaming executor can keep blocks columnar.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input: Common-Crawl-style pages table (authoritative, BASELINE.json input_hint)
# ---------------------------------------------------------------------------
PAGES = pa.schema(
    [
        ("url", pa.string()),            # primary key
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),           # raw payload: HTML bytes or PDF bytes (%PDF- magic)
        ("text", pa.string()),           # noisy pre-extracted text (input, not the answer)
        ("lang", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# Stage-1 output: candidate content blocks per page.
# (char_start, char_end) intervals are the 1-D analog of the reference's xyxy
# boxes (utils/image/bounding_box/converter.py:143-178).
# ---------------------------------------------------------------------------
BLOCK = pa.struct(
    [
        ("block_id", pa.int32()),
        ("kind", pa.string()),           # text|code|table|list|heading|chrome
        ("char_start", pa.int64()),
        ("char_end", pa.int64()),
        ("dom_path", pa.string()),
        ("text_density", pa.float32()),
        ("link_density", pa.float32()),
        ("score", pa.float32()),
    ]
)

BLOCKS = pa.schema(
    [
        ("url", pa.string()),
        ("blocks", pa.list_(BLOCK)),
    ]
)

# ---------------------------------------------------------------------------
# Stage-2 output: typed paragraphs per page (the reference's paragraph record,
# utils/text/parsers/__init__.py:99-128 + pdf_parser.py:110-168).
# ---------------------------------------------------------------------------
PARAGRAPH = pa.struct(
    [
        ("type", pa.string()),           # text|code|table|list|image
        ("text", pa.string()),
        ("section", pa.list_(pa.string())),
        ("is_footnote", pa.bool_()),
        ("is_header", pa.bool_()),
        ("is_page_number", pa.bool_()),
        ("page", pa.int32()),
        ("order", pa.int32()),           # stable within-document order key
    ]
)

# ---------------------------------------------------------------------------
# Final extracted table (the OCR-result analog, models/ocr/base_ocr.py:229-236).
# ---------------------------------------------------------------------------
EXTRACTED = pa.schema(
    [
        ("url", pa.string()),
        ("extracted", pa.string()),      # the byte-identical target text
        ("title", pa.string()),
        ("n_blocks", pa.int32()),
        ("kind", pa.string()),           # html|pdf|empty
        ("status", pa.string()),         # ok|error
        ("error", pa.string()),
        ("digest", pa.string()),         # sha256 hex of extracted
        ("lang", pa.string()),
    ]
)

EXTRACTED_FULL = pa.schema(
    list(EXTRACTED) + [pa.field("paragraphs", pa.list_(PARAGRAPH))]
)

# ---------------------------------------------------------------------------
# Per-partition lineage manifest (the map.json resume DB made partition-
# granular, cf. utils/callbacks/file_saver.py:145-192).
# ---------------------------------------------------------------------------
MANIFEST = pa.schema(
    [
        ("partition_id", pa.int64()),
        ("n_docs", pa.int64()),
        ("input_digest", pa.string()),
        ("output_digest", pa.string()),
        ("status", pa.string()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def list_column_matrix(col, dtype="float64"):
    """Fixed-width ``list<number>`` column -> 2-D numpy matrix WITHOUT the
    per-element ``to_pylist`` Python round-trip: flatten the Arrow list
    values buffer straight to numpy and reshape.  The embedding columns are
    fixed-dimension by contract; raises if widths are ragged."""
    import numpy as np
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    widths = np.unique(np.asarray(col.value_lengths(), dtype=np.int64))
    if len(widths) != 1:
        raise ValueError("ragged list column cannot form a matrix")
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(dtype, copy=False)
    return flat.reshape(n, int(widths[0]))
