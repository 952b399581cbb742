"""PDF layout parse: text objects -> lines -> paragraphs with classification.

Mirrors the reference PDF parser's grouping heuristics
(/root/reference/utils/text/parsers/pdf_parser.py):

- ``group_blocks_in_lines`` (pdf_parser.py:181-266): text objects sharing
  ≥50% vertical overlap form a line; within a line objects sort by x; an
  inter-word space is inserted when the x-gap exceeds ``0.35 ×`` the font
  size; a run whose size is < 0.8× the line-median size and whose baseline
  sits above the line baseline is a superscript — if numeric it becomes a
  footnote reference marker ``^{n}``.
- ``group_lines_in_paragraphs`` (pdf_parser.py:269-346): consecutive lines
  merge while the y-gap stays ≤ ``0.9 × leading`` and the dominant font size
  matches; a font-size change or large gap starts a new paragraph.
- classification (pdf_parser.py:146-162): running headers (top 8% of the
  page), page numbers (bottom 8%, digit-only), footnote paragraphs (bottom
  third, small font, leading superscript index).
- order weights (pdf_parser.py:164-166, 361-369): header 0 < body 1 <
  footnote 2 < page-number 3, stable-sorted per page — the determinism
  backbone for byte-identical output.

Pure NumPy-free Python over small per-document lists (a document has at most
thousands of text objects); runs inside the extractor actor's batch call.
"""

from __future__ import annotations

from .minipdf import PAGE_H, TextObj

WORD_GAP_FACTOR = 0.35       # pdf_parser.py inter-word space threshold
SUPERSCRIPT_SIZE = 0.8       # size ratio below which a raised run is superscript
LINE_OVERLAP = 0.5           # min y-overlap ratio to share a line
PARA_GAP_FACTOR = 0.9        # max y-gap in leadings inside a paragraph
HEADER_BAND = 0.92           # y above 92% of page height ⇒ running header
FOOTER_BAND = 0.08           # y below 8% ⇒ page-number band
FOOTNOTE_BAND = 0.33         # bottom third of the page

ORDER_WEIGHTS = {"header": 0, "body": 1, "footnote": 2, "page_number": 3}


def _approx_char_w(size: float) -> float:
    return size * 0.5


def group_objs_in_lines(objs: list[TextObj]) -> list[dict]:
    """Group one page's text objects into lines (pdf_parser.py:181-266)."""
    if not objs:
        return []
    objs = sorted(objs, key=lambda o: (-o.y, o.x))
    max_size = max(o.size for o in objs)
    lines: list[list[TextObj]] = []
    start = 0  # lines before this can never match any remaining obj:
    # objs arrive in descending y, so once ref.y - o.y >= max_size the
    # overlap with this and every later obj is <= 0 (keeps the scan O(N)
    # instead of O(N * n_lines) while matching the naive first-match order)
    for o in objs:
        while start < len(lines) and lines[start][0].y - o.y >= max_size:
            start += 1
        placed = False
        for li in range(start, len(lines)):
            ref = lines[li][0]
            h = max(ref.size, o.size)
            overlap = min(ref.y + ref.size, o.y + o.size) - max(ref.y, o.y)
            if overlap / h >= LINE_OVERLAP:
                lines[li].append(o)
                placed = True
                break
        if not placed:
            lines.append([o])

    out = []
    for line in lines:
        line.sort(key=lambda o: o.x)
        sizes = sorted(o.size for o in line)
        median = sizes[len(sizes) // 2]
        baseline = min(o.y for o in line if o.size >= SUPERSCRIPT_SIZE * median) \
            if any(o.size >= SUPERSCRIPT_SIZE * median for o in line) else min(o.y for o in line)
        parts: list[str] = []
        footnote_refs: list[int] = []
        x_end = None
        for o in line:
            is_super = (
                o.size < SUPERSCRIPT_SIZE * median
                and o.y > baseline + 0.15 * median
            )
            token = o.text
            if is_super and token.strip().isdigit():
                idx = int(token.strip())
                footnote_refs.append(idx)
                token = "^{}".format(idx)
                parts.append(token)  # attach without preceding space
                x_end = o.x + len(o.text) * _approx_char_w(o.size)
                continue
            if x_end is not None and o.x - x_end > WORD_GAP_FACTOR * o.size:
                parts.append(" ")
            elif x_end is not None:
                parts.append(" ")  # writer emits one object per word
            parts.append(token)
            x_end = o.x + len(o.text) * _approx_char_w(o.size)
        text = "".join(parts).replace(" ^", "^")
        out.append(
            {
                "text": text,
                "y": baseline,
                "top": max(o.y + o.size for o in line),
                "x": line[0].x,
                "size": median,
                "footnotes": footnote_refs,
            }
        )
    out.sort(key=lambda l: (-l["y"], l["x"]))
    return out


def group_lines_in_paragraphs(lines: list[dict]) -> list[dict]:
    """Merge consecutive lines into paragraphs (pdf_parser.py:269-346)."""
    paras: list[dict] = []
    cur: list[dict] = []

    def flush():
        if not cur:
            return
        paras.append(
            {
                "text": " \n".join(l["text"] for l in cur),  # line join (base_ocr.py:232)
                "y_top": cur[0]["y"],
                "y_bottom": cur[-1]["y"],
                "x": cur[0]["x"],
                "size": cur[0]["size"],
                "footnotes": [i for l in cur for i in l["footnotes"]],
            }
        )

    for line in lines:
        if not cur:
            cur = [line]
            continue
        prev = cur[-1]
        leading = max(prev["size"], line["size"]) * 1.2
        gap = prev["y"] - line["y"]
        same_font = abs(prev["size"] - line["size"]) <= 0.01
        if same_font and 0 < gap <= (1.0 + PARA_GAP_FACTOR) * leading:
            cur.append(line)
        else:
            flush()
            cur = [line]
    flush()
    return paras


def classify_paragraph(para: dict, body_size: float) -> str:
    """header | body | footnote | page_number (pdf_parser.py:146-162)."""
    y_rel = para["y_top"] / PAGE_H
    text = para["text"].strip()
    if y_rel >= HEADER_BAND:
        return "header"
    if y_rel <= FOOTER_BAND and text.replace("Page", "").replace("-", "").strip().isdigit():
        return "page_number"
    if (
        y_rel <= FOOTNOTE_BAND
        and para["size"] < 0.85 * body_size
        and text.startswith("^")
    ):
        return "footnote"
    return "body"


def extract_pdf_page_objs(objs: list[TextObj]) -> list[dict]:
    """One page of text objects -> classified, order-weighted paragraphs."""
    lines = group_objs_in_lines(objs)
    paras = group_lines_in_paragraphs(lines)
    if not paras:
        return []
    # dominant body font = the size covering the most characters (a
    # char-mass-weighted mode; pdf_parser.py derives body size from the
    # font-size distribution the same way)
    mass: dict[float, int] = {}
    for p in paras:
        mass[p["size"]] = mass.get(p["size"], 0) + len(p["text"])
    body_size = max(mass.items(), key=lambda kv: (kv[1], kv[0]))[0]
    out = []
    for p in paras:
        cls = classify_paragraph(p, body_size)
        footnote_index = 0
        if cls == "footnote":
            marker = p["text"].strip().split(" ", 1)[0]
            digits = marker.lstrip("^")
            footnote_index = int(digits) if digits.isdigit() else 0
        out.append(
            {
                "type": "text",
                "text": p["text"],
                "section": [],
                "is_footnote": cls == "footnote",
                "is_header": cls == "header",
                "is_page_number": cls == "page_number",
                "footnote_index": footnote_index,
                "footnotes": p["footnotes"],
                "weight": ORDER_WEIGHTS[cls],
                "y": p["y_top"],
            }
        )
    # stable sort by order weight within the page (pdf_parser.py:164-166,361-369)
    out.sort(key=lambda p: p["weight"])
    return out


def extract_pdf_paragraphs(objs: list[TextObj]) -> list[dict]:
    """All pages -> paragraph records with per-document order."""
    by_page: dict[int, list[TextObj]] = {}
    for o in objs:
        by_page.setdefault(o.page, []).append(o)
    paragraphs: list[dict] = []
    for page in sorted(by_page):
        for p in extract_pdf_page_objs(by_page[page]):
            p["page"] = page
            p["order"] = len(paragraphs)
            paragraphs.append(p)
    return paragraphs
