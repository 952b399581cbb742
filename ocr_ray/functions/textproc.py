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
    """Template rendering with the reference's dispatch
    (text_processing.py:298-327 M16): no ``{`` -> returned verbatim,
    ``{{``/``{%`` -> sandboxed jinja render, ``{name}`` -> python format,
    anything else verbatim."""
    if "{" not in template:
        return template
    if "{%" in template or "{{" in template:
        return _compile_jinja(template).render(**values)
    if re.search(r"\{[^\s\'\"]+\}", template):
        return template.format(**values)
    return template


_JINJA_CACHE: dict = {}


def _compile_jinja(template: str):
    """Sandboxed jinja compile, cached (text_processing.py:329-345)."""
    cached = _JINJA_CACHE.get(template)
    if cached is None:
        from jinja2.sandbox import ImmutableSandboxedEnvironment

        cached = ImmutableSandboxedEnvironment().from_string(template)
        _JINJA_CACHE[template] = cached
    return cached


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


def filter_texts(
    texts,
    lengths,
    *,
    min_text_length: int = -1,
    max_text_length: int = -1,
    max_sentences: int = -1,
    max_sentence_length: int = -1,
    max_total_length: int = -1,
    sort_by_length: bool = False,
    max_texts: int = -1,
    select_mode: str = "start",
    required_idx: int = -1,
    rng=None,
    return_indices: bool = False,
):
    """Budgeted text selection (tokens_processing.py:83-193 F10).

    ``lengths`` is per-text (1-D) or per-sentence (2-D list-of-lists).
    Stages, in reference order: per-text length bounds; multi-sentence
    bounds; a ``max_total_length`` token budget that drops texts once the
    running sum (optionally over length-sorted order, ``required_idx``
    first) exceeds the budget; a ``max_texts`` cap resolved by
    ``select_mode`` in {'start', 'end', 'random'}; and required-idx
    invalidation (if the required text fell, everything falls).

    Divergence from the reference: random mode samples WITHOUT replacement
    (``np.random.choice`` with the default replace=True can skip fewer
    unique texts than requested) and takes an injectable ``rng`` so
    pipelines stay deterministic.
    """
    import numpy as np

    is_multi = bool(len(lengths)) and isinstance(lengths[0], (list, tuple, np.ndarray))
    if is_multi:
        text_lengths = np.asarray([int(sum(l)) for l in lengths], dtype=np.int64)
        n_sentences = np.asarray(
            [int(sum(1 for x in l if x > 0)) for l in lengths], dtype=np.int64
        )
        max_sentence = np.asarray(
            [int(max(l)) if len(l) else 0 for l in lengths], dtype=np.int64
        )
    else:
        text_lengths = np.asarray(lengths, dtype=np.int64)

    valid = np.ones(len(text_lengths), dtype=bool)
    if min_text_length > -1:
        valid[text_lengths < min_text_length] = False
    if max_text_length > -1:
        valid[text_lengths > max_text_length] = False
    if is_multi:
        if max_sentences > 0:
            valid[n_sentences > max_sentences] = False
        if max_sentence_length > -1:
            valid[max_sentence > max_sentence_length] = False

    if max_total_length > 0 and text_lengths[valid].sum() > max_total_length:
        if sort_by_length:
            order = np.argsort(text_lengths, kind="stable")
            order = order[valid[order]]
        else:
            order = np.where(valid)[0]
        if required_idx != -1:
            order = np.concatenate([[required_idx], order[order != required_idx]])
        over = np.cumsum(text_lengths[order]) > max_total_length
        valid[order[over]] = False

    if max_texts > 0:
        budget = max_texts - (1 if required_idx != -1 else 0)
        if valid.sum() > budget:
            idx = np.where(valid)[0]
            if required_idx != -1:
                idx = idx[idx != required_idx]
            if select_mode == "random":
                rng = rng or np.random.RandomState(0)
                n_skip = max(0, len(idx) - budget)
                skip = rng.choice(idx, size=n_skip, replace=False)
            elif select_mode == "start":
                skip = idx[budget:]
            elif select_mode == "end":
                skip = idx[:-budget] if budget else idx
            else:
                raise ValueError("Unknown `select_mode` : {}".format(select_mode))
            valid[skip] = False

    if required_idx != -1 and not valid[required_idx]:
        valid[:] = False

    kept = [t for t, v in zip(texts, valid) if v]
    kept_lengths = [l for l, v in zip(lengths, valid) if v]
    if return_indices:
        return kept, kept_lengths, np.where(valid)[0].tolist()
    return kept, kept_lengths
