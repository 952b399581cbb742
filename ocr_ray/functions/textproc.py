"""Sentence splitting and length-budget chunking.

Mirrors /root/reference/utils/text/text_processing.py (SURVEY §2.2
M10-M12) and the paragraph chunking pipeline
(paragraphs_processing.py:26-142, G10):

- :func:`split_sentences` — regex end-of-sentence split with abbreviation /
  decimal / closing-quote repair (text_processing.py:228-279).
- :func:`split_text` — recursive paragraph -> sentence -> word splitting
  under a length budget with tolerance (text_processing.py:34-144).
- :func:`merge_texts` — greedy re-merge of pieces up to the budget
  (text_processing.py:146-226).
- :func:`chunk_text` — split+merge with overlap, the chunks_from_paragraphs
  shape (1 row -> n chunk rows inside a flat_map-style batch fn).

Lengths are measured in whitespace tokens by default (``len_fn``).
"""

from __future__ import annotations

import re

_EOS_RE = re.compile(r"(?<=[.!?])\s+")
_ABBREV_TAIL = re.compile(r"(?:\b[A-Z]|\b(?:mr|mrs|dr|st|vs|etc|e\.g|i\.e))\.$", re.IGNORECASE)
_CLOSERS = "\"')]}"


def _token_len(text: str) -> int:
    return len(text.split())


def split_sentences(text: str) -> list[str]:
    """EOS split with repairs: don't break after single-letter/known
    abbreviations or decimal points; glue dangling closing quotes to the
    previous sentence (text_processing.py:228-279)."""
    if not text:
        return []
    raw = _EOS_RE.split(text)
    out: list[str] = []
    for piece in raw:
        if out and (_ABBREV_TAIL.search(out[-1]) or _is_decimal_break(out[-1], piece)):
            out[-1] = out[-1] + " " + piece
        elif out and piece and piece[0] in _CLOSERS:
            out[-1] = out[-1] + " " + piece
        else:
            out.append(piece)
    return [s for s in out if s.strip()]


def _is_decimal_break(prev: str, nxt: str) -> bool:
    return bool(prev and nxt and prev[-1] == "." and prev[-2:-1].isdigit() and nxt[0].isdigit())


def split_text(
    text: str,
    max_length: int,
    *,
    tolerance: float = 0.2,
    len_fn=_token_len,
) -> list[str]:
    """Recursive split under ``max_length`` (+tolerance) tokens:
    paragraphs ('\\n\\n') -> sentences -> words
    (text_processing.py:34-144).  Pieces are never merged here — that is
    :func:`merge_texts`' job, as in the reference."""
    budget = max_length * (1 + tolerance)
    if len_fn(text) <= budget:
        return [text] if text else []
    for splitter in (
        lambda t: [p for p in t.split("\n\n") if p.strip()],
        split_sentences,
    ):
        pieces = splitter(text)
        if len(pieces) > 1:
            out: list[str] = []
            for p in pieces:
                out.extend(split_text(p, max_length, tolerance=tolerance, len_fn=len_fn))
            return out
    # word-level fallback
    words = text.split()
    return [
        " ".join(words[i : i + max_length]) for i in range(0, len(words), max_length)
    ]


def merge_texts(
    pieces: list[str],
    max_length: int,
    *,
    sep: str = " ",
    len_fn=_token_len,
) -> list[str]:
    """Greedy re-merge of consecutive pieces up to ``max_length``
    (text_processing.py:146-226)."""
    out: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for p in pieces:
        n = len_fn(p)
        if cur and cur_len + n > max_length:
            out.append(sep.join(cur))
            cur, cur_len = [], 0
        cur.append(p)
        cur_len += n
    if cur:
        out.append(sep.join(cur))
    return out


def format_text(template: str, **values) -> str:
    """Python-format template rendering (text_processing.py:298-327 M16;
    the reference also supports jinja — py-format covers the data path)."""
    return template.format(**values)


def chunk_text(
    text: str,
    max_length: int,
    *,
    overlap: int = 0,
    len_fn=_token_len,
) -> list[str]:
    """Split to sentences then greedily pack into ~max_length chunks with
    ``overlap`` trailing tokens repeated at each boundary
    (chunks_from_paragraphs, paragraphs_processing.py:26-142)."""
    pieces = split_text(text, max_length, len_fn=len_fn)
    chunks = merge_texts(pieces, max_length, len_fn=len_fn)
    if overlap <= 0 or len(chunks) < 2:
        return chunks
    out = [chunks[0]]
    for prev, cur in zip(chunks, chunks[1:]):
        tail = " ".join(prev.split()[-overlap:])
        out.append(tail + " " + cur)
    return out
