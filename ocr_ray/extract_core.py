"""Per-page extraction core: payload dispatch -> paragraphs -> final text.

This is the single source of truth for WHAT gets extracted; both the
single-process oracle (:mod:`ocr_ray.reference`) and the Ray actor stage
(:mod:`ocr_ray.stages.extract`) call :func:`extract_page`, which is how the
engine guarantees byte-identical output regardless of parallelism.

Flow per page (mirrors /root/reference pipeline lifecycle, SURVEY §3):

1. payload sniff — ``%PDF-`` magic vs HTML (parsers/__init__.py:173-191)
2. stage 1 detect — DOM block segmentation (HTML) or layout parse (PDF)
3. stage 2 extract — typed paragraphs with section stacks / classification
4. post-process — skip headers & page numbers, footnote handling
   (paragraphs_processing.py:255-312), per-document exact + near-dup span
   filtering (base_ocr.py:679-725)
5. assemble — paragraphs joined with '\\n\\n' (parser.py:31-37)

Error policy: malformed payloads yield ``status='error'`` rows, never an
exception that poisons a whole batch (the reference logs-and-drops,
utils/threading/stream.py:338-345).
"""

from __future__ import annotations

import hashlib

from . import doc_parsers, html_extract, minipdf, pdf_extract
from .functions.metrics import byte_histogram, is_near_duplicate_cached

NEAR_DUP_THRESHOLD = 0.2   # base_ocr.py:716-723
NEAR_DUP_WINDOW = 5        # compare against the last k emitted spans
NEAR_DUP_MAX_LEN = 20_000  # spans longer than this get exact dedup only:
# Myers is O(len^2/64) and a multi-MB pathological span would stall a task
# (the NMS-tiling cap philosophy, non_max_suppression.py:105-115)


def filter_duplicate_spans(paragraphs: list[dict]) -> list[dict]:
    """Per-document exact + near-dup span filter (base_ocr.py:679-725).

    State (the emitted set + last-k window) is scoped to one document —
    never actor-global — so results cannot depend on batch composition
    (SURVEY §2.4 T5).
    """
    emitted: set[str] = set()
    last: list[tuple] = []
    out = []
    for p in paragraphs:
        if p["type"] != "text":
            out.append(p)
            continue
        text = p["text"]
        if text in emitted:
            continue
        if len(text) <= NEAR_DUP_MAX_LEN:
            hist = byte_histogram(text)
            if any(
                is_near_duplicate_cached(text, hist, prev, prev_hist, NEAR_DUP_THRESHOLD)
                for prev, prev_hist in last
            ):
                continue
            last.append((text, hist))
            if len(last) > NEAR_DUP_WINDOW:
                last.pop(0)
        emitted.add(text)
        out.append(p)
    return out


def insert_footnotes(paragraphs: list[dict], mode: str = "insert") -> list[dict]:
    """Footnote join: footnote paragraphs keyed (page, index) merged into the
    referencing paragraph (paragraphs_processing.py:292-302,314-334).

    Modes, mirroring the reference's _insert_footnote:
    - ``insert``               — replace the ``^n`` marker in place
    - ``insert_next_sentence`` — drop the marker, insert the note as a new
      sentence right after the referencing sentence
    - ``insert_last_sentence`` — drop the marker, append the note at the
      paragraph end
    """
    notes = {
        (p.get("page", 0), p.get("footnote_index", 0)): p
        for p in paragraphs
        if p.get("is_footnote")
    }
    out = []
    for p in paragraphs:
        if p.get("is_footnote"):
            continue
        text = p["text"]
        for idx in p.get("footnotes", ()):
            note = notes.get((p.get("page", 0), idx))
            if note is None:
                continue
            marker = "^{}".format(idx)
            formatted = " Footnote: " + note["text"].replace(marker, "", 1).lstrip()
            if mode == "insert":
                text = text.replace(marker, formatted)
            elif mode == "insert_next_sentence":
                from .functions.textproc import split_sentences

                sentences = split_sentences(text) or [text]
                for i, sent in enumerate(sentences):
                    if marker in sent:
                        break
                sentences[i] = sentences[i].replace(marker, "")
                sentences.insert(i + 1, formatted.lstrip())
                text = " ".join(sentences)
            elif mode == "insert_last_sentence":
                text = text.replace(marker, "") + formatted
        if text != p["text"]:
            p = dict(p, text=text)
        out.append(p)
    return out


def assemble_text(
    paragraphs: list[dict],
    *,
    skip_header: bool = True,
    skip_page_number: bool = True,
    footnote_mode: str = "keep",   # keep | skip | insert | insert_next_sentence | insert_last_sentence
) -> tuple[str, list[dict]]:
    """Post-process + join (the process_paragraphs defaults,
    paragraphs_processing.py:255-312)."""
    paras = paragraphs
    if skip_header:
        paras = [p for p in paras if not p.get("is_header")]
    if skip_page_number:
        paras = [p for p in paras if not p.get("is_page_number")]
    if footnote_mode == "skip":
        paras = [p for p in paras if not p.get("is_footnote")]
        paras = [
            dict(p, text=_strip_markers(p["text"], p.get("footnotes", ()))) for p in paras
        ]
    elif footnote_mode.startswith("insert"):
        paras = insert_footnotes(paras, mode=footnote_mode)
    paras = filter_duplicate_spans(paras)
    text = "\n\n".join(p["text"] for p in paras if p.get("text")).strip()
    return text, paras


def _strip_markers(text: str, footnotes) -> str:
    for idx in footnotes:
        text = text.replace("^{}".format(idx), "")
    return text


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def payload_kind(url: str, payload: bytes) -> str:
    """Parser dispatch: ``%PDF-`` magic first, then the url path extension
    (the reference's extension registry, parsers/__init__.py:173-177 — a
    crawl's text/markdown/code payloads must not be parsed as HTML), html
    otherwise."""
    if minipdf.is_pdf(payload):
        return "pdf"
    return doc_parsers.EXTENSION_KINDS.get(doc_parsers.url_extension(url), "html")


def detect_paragraphs(url: str, payload: bytes) -> tuple[list[dict], str, str]:
    """Stage-1 detect: payload -> (paragraphs, title, kind).

    The single dispatch shared by the fused path (:func:`extract_page`) and
    the exploded path (stages.extract.BlockExtractor), so both stay
    byte-identical by construction.  Raises on malformed payloads — callers
    turn that into an error row."""
    kind = payload_kind(url, payload)
    title = ""
    if kind == "pdf":
        paragraphs = pdf_extract.extract_pdf_paragraphs(
            minipdf.read_text_objects(payload)
        )
    elif kind == "docx":
        paragraphs = doc_parsers.parse_docx(payload)
    elif kind in ("md", "txt", "py", "java"):
        text_payload = payload.decode("utf-8")  # non-UTF8 -> error row
        paragraphs = {
            "md": doc_parsers.parse_markdown,
            "txt": doc_parsers.parse_txt,
            "py": doc_parsers.parse_python,
            "java": doc_parsers.parse_java,
        }[kind](text_payload)
    else:
        page = html_extract.extract_html_page(payload.decode("utf-8"))
        paragraphs = page["paragraphs"]
        title = page["title"]
    return paragraphs, title, kind


def extract_page(
    url: str,
    payload: bytes,
    *,
    lang: str = "",
    footnote_mode: str = "keep",
    include_paragraphs: bool = False,
) -> dict:
    """One page -> one EXTRACTED-schema row (dict).

    ``include_paragraphs=True`` adds the structural golden column
    (FIXTURES.md §3): the full classified paragraph list — headers/page
    numbers INCLUDED with their flags, so structure tests can see what the
    text assembly skipped."""
    try:
        if not payload:
            return _row(url, "", "", 0, "empty", "error", "empty payload", lang,
                        [] if include_paragraphs else None)
        paragraphs, title, kind = detect_paragraphs(url, payload)
        text, kept = assemble_text(paragraphs, footnote_mode=footnote_mode)
        structural = (
            [_paragraph_struct(p) for p in paragraphs] if include_paragraphs else None
        )
        return _row(url, text, title, len(kept), kind, "ok", "", lang, structural)
    except Exception as exc:  # malformed payload -> error row (never a crash)
        return _row(
            url, "", "", 0, "error", "error",
            "{}: {}".format(type(exc).__name__, exc), lang,
            [] if include_paragraphs else None,
        )


def _paragraph_struct(p: dict) -> dict:
    return {
        "type": p.get("type", "text"),
        "text": p.get("text", ""),
        "section": [s for s in p.get("section", ())],
        "is_footnote": bool(p.get("is_footnote", False)),
        "is_header": bool(p.get("is_header", False)),
        "is_page_number": bool(p.get("is_page_number", False)),
        "page": int(p.get("page", 0)),
        "order": int(p.get("order", 0)),
    }


def _row(url, extracted, title, n_blocks, kind, status, error, lang,
         paragraphs=None) -> dict:
    out = {
        "url": url,
        "extracted": extracted,
        "title": title,
        "n_blocks": n_blocks,
        "kind": kind,
        "status": status,
        "error": error,
        "digest": sha256_hex(extracted) if status == "ok" else "",
        "lang": lang,
    }
    if paragraphs is not None:
        out["paragraphs"] = paragraphs
    return out
