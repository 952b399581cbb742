"""Extraction stages for ``map_batches`` actor pools.

The reference pays model construction once per process via its
``ModelInstances`` singleton (models/interfaces/base_model.py:30-54); the
Ray-idiomatic equivalent is a callable CLASS on an actor pool — setup in
``__init__`` (once per actor), work in ``__call__`` (per Arrow batch).

Two shapes are provided:

- :class:`PageExtractor` — fused detect+extract: one pages row in, one
  EXTRACTED row out.  The default path: no shuffle at all.
- :class:`BlockExtractor` + :func:`assemble_group` — the exploded path:
  stage 1 emits one row per paragraph block, a ``groupby('url')``
  reassembles documents in document order (the north rule's one true
  shuffle, SURVEY §2.6 G12).  Byte-identical to the fused path; used when
  giant documents must be split across tasks.
"""

from __future__ import annotations

import pyarrow as pa

from ..extract_core import assemble_text, detect_paragraphs, extract_page, sha256_hex
from ..schema import EXTRACTED, EXTRACTED_FULL


def extract_batch(
    batch: pa.Table, *, footnote_mode: str = "keep", include_paragraphs: bool = False
) -> pa.Table:
    """Fused per-page detect+extract, stateless form. Arrow in, Arrow out.

    The per-row Python work (an HTML/PDF parse) IS the useful compute —
    the analog of model inference — so a Python loop over rows here is the
    kernel, not overhead; everything around it stays columnar.

    This extractor's only state (compiled regexes) is module-level, paid at
    import in each worker, so stateless tasks beat an actor pool: tasks
    start the moment blocks arrive instead of waiting on pool spin-up
    (~15% wall on a 32-CPU node).  Stages with real per-actor state (model
    weights, vocabularies) should use the callable-class form
    (:class:`PageExtractor`) on an actor pool.
    """
    urls = batch.column("url").to_pylist()
    payloads = batch.column("html").to_pylist()
    langs = (
        batch.column("lang").to_pylist()
        if "lang" in batch.column_names
        else [""] * len(urls)
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


class PageExtractor:
    """Actor-pool form of :func:`extract_batch` (setup once per actor)."""

    def __init__(self, footnote_mode: str = "keep"):
        self.footnote_mode = footnote_mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(batch, footnote_mode=self.footnote_mode)


_BLOCK_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("order", pa.int32()),
        ("type", pa.string()),
        ("text", pa.string()),
        ("page", pa.int32()),
        ("is_footnote", pa.bool_()),
        ("is_header", pa.bool_()),
        ("is_page_number", pa.bool_()),
        ("footnote_index", pa.int32()),
        ("footnotes", pa.list_(pa.int32())),
        ("title", pa.string()),
        ("kind", pa.string()),
        ("status", pa.string()),
        ("error", pa.string()),
        ("lang", pa.string()),
    ]
)


class BlockExtractor:
    """Stage 1 of the exploded path: pages -> one row per paragraph block.

    Emits a sentinel row (order = -1) per document so empty/error documents
    survive the groupby."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        langs = (
            batch.column("lang").to_pylist()
            if "lang" in batch.column_names
            else [""] * len(urls)
        )
        for url, payload, lang in zip(urls, payloads, langs):
            base = {
                "url": url, "order": -1, "type": "", "text": "", "page": 0,
                "is_footnote": False, "is_header": False, "is_page_number": False,
                "footnote_index": 0, "footnotes": [], "title": "",
                "kind": "", "status": "ok", "error": "", "lang": lang,
            }
            try:
                if not payload:
                    rows.append(dict(base, kind="empty", status="error", error="empty payload"))
                    continue
                paragraphs, title, kind = detect_paragraphs(url, payload)
                rows.append(dict(base, title=title, kind=kind))
                for p in paragraphs:
                    rows.append(
                        dict(
                            base,
                            order=int(p["order"]),
                            type=p["type"],
                            text=p.get("text", ""),
                            page=int(p.get("page", 0)),
                            is_footnote=bool(p.get("is_footnote", False)),
                            is_header=bool(p.get("is_header", False)),
                            is_page_number=bool(p.get("is_page_number", False)),
                            footnote_index=int(p.get("footnote_index", 0)),
                            footnotes=[int(x) for x in p.get("footnotes", ())],
                            title=title,
                            kind=kind,
                        )
                    )
            except Exception as exc:
                rows.append(
                    dict(base, kind="error", status="error",
                         error="{}: {}".format(type(exc).__name__, exc))
                )
        return pa.Table.from_pylist(rows, schema=_BLOCK_SCHEMA)


def _assemble_one(rows: list[dict], footnote_mode: str) -> dict:
    """Block rows of ONE url (sorted by order) -> one EXTRACTED row dict."""
    head = rows[0]
    url, lang = head["url"], head["lang"]
    if head["status"] == "error":
        return {
            "url": url, "extracted": "", "title": "", "n_blocks": 0,
            "kind": head["kind"], "status": "error", "error": head["error"],
            "digest": "", "lang": lang,
        }
    paragraphs = [
        {
            "type": r["type"],
            "text": r["text"],
            "page": r["page"],
            "is_footnote": r["is_footnote"],
            "is_header": r["is_header"],
            "is_page_number": r["is_page_number"],
            "footnote_index": r["footnote_index"],
            "footnotes": r["footnotes"] or [],
            "order": r["order"],
        }
        for r in rows
        if r["order"] >= 0
    ]
    text, kept = assemble_text(paragraphs, footnote_mode=footnote_mode)
    return {
        "url": url,
        "extracted": text,
        "title": head["title"],
        "n_blocks": len(kept),
        "kind": head["kind"],
        "status": "ok",
        "error": "",
        "digest": sha256_hex(text),
        "lang": lang,
    }


def assemble_group(group: pa.Table, *, footnote_mode: str = "keep") -> pa.Table:
    """``groupby('url').map_groups`` fn: block rows -> one EXTRACTED row.

    Order is derived from the data (the explicit ``order`` column), never
    from executor block order (SURVEY §4 ordering row)."""
    rows = group.sort_by("order").to_pylist()
    return pa.Table.from_pylist(
        [_assemble_one(rows, footnote_mode)], schema=EXTRACTED
    )


def assemble_bucket(group: pa.Table, *, footnote_mode: str = "keep") -> pa.Table:
    """``groupby('url_bucket').map_groups`` fn: ALL urls of one hash bucket
    assembled in one pass (runs over rows sorted by (url, order)).

    One Python call per url (600k map_groups invocations for 600k docs) is
    ~10x slower than the shuffle itself; bucketing by url-hash turns that
    into one call per bucket — the guide's coarse-key groupby pattern.
    Output is byte-identical to :func:`assemble_group`."""
    rows = group.sort_by([("url", "ascending"), ("order", "ascending")]).to_pylist()
    out: list[dict] = []
    start = 0
    for i in range(1, len(rows) + 1):
        if i == len(rows) or rows[i]["url"] != rows[start]["url"]:
            out.append(_assemble_one(rows[start:i], footnote_mode))
            start = i
    return pa.Table.from_pylist(out, schema=EXTRACTED)
