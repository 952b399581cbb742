"""Text distance metrics (reference: /root/reference/utils/text/metrics.py).

Used by the per-document near-duplicate span filter
(base_ocr.py:716-723: normalized edit distance < 0.2 vs the last k emitted
spans) and exposed as a standalone kernel for dedup queries.
"""

from __future__ import annotations

from collections import Counter

import numpy as np


def edit_distance(a: str, b: str, k: int | None = None) -> int:
    """Levenshtein distance (metrics.py:86-159 computes the same quantity).

    Myers' bit-parallel algorithm (Myers, JACM 1999): the DP column is held
    in arbitrary-precision int bitvectors, one word-op row per character of
    ``a`` — exact, and ~100x faster than the naive DP for the span lengths
    the near-dup filter sees in the extraction hot path.

    With ``k`` set, bails out as soon as the distance is provably > k
    (the running column minimum can drop at most 1 per remaining row) and
    returns SOME value > k — callers only use the <= k / > k decision."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) < len(b):
        a, b = b, a
    m = len(b)
    peq: dict[str, int] = {}
    bit = 1
    for c in b:
        peq[c] = peq.get(c, 0) | bit
        bit <<= 1
    mask = (1 << m) - 1
    last = 1 << (m - 1)
    pv, mv, score = mask, 0, m
    remaining = len(a)
    for c in a:
        eq = peq.get(c, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | (~(xh | pv) & mask)
        mh = pv & xh
        if ph & last:
            score += 1
        elif mh & last:
            score -= 1
        remaining -= 1
        if k is not None and score - remaining > k:
            return k + 1
        ph = ((ph << 1) | 1) & mask
        mh = (mh << 1) & mask
        pv = mh | (~(xv | ph) & mask)
        mv = ph & xv
    return score


def edit_distance_lower_bound(a: str, b: str) -> int:
    """Cheap sound lower bound: length difference and character-histogram
    L1/2 (one edit changes at most two histogram entries by one each)."""
    if a == b:
        return 0
    ca, cb = Counter(a), Counter(b)
    diff = sum((ca - cb).values()) + sum((cb - ca).values())
    return max(abs(len(a) - len(b)), (diff + 1) // 2)


def normalized_edit_distance(a: str, b: str) -> float:
    """edit_distance / max length, in [0, 1]."""
    m = max(len(a), len(b))
    return edit_distance(a, b) / m if m else 0.0


def byte_histogram(text: str) -> np.ndarray:
    """256-bin UTF-8 byte histogram (int64) — the cached sketch the
    near-dup lower bound compares (np.bincount is a C loop; a Counter-based
    histogram dominated the extraction profile)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    return np.bincount(data, minlength=256)


def is_near_duplicate(a: str, b: str, threshold: float = 0.2) -> bool:
    """Near-dup test with sound cheap prefilters (length diff, byte-
    histogram L1) and a threshold-bounded DP."""
    return is_near_duplicate_cached(a, byte_histogram(a), b, byte_histogram(b), threshold)


def _max_qualifying(m: int, threshold: float) -> int:
    """Largest integer d with d/m < threshold (strict, matching the
    reference's `< 0.2` comparison)."""
    d = int(threshold * m)
    while d / m >= threshold:
        d -= 1
    return d


def is_near_duplicate_cached(
    a: str, ha: np.ndarray, b: str, hb: np.ndarray, threshold: float = 0.2
) -> bool:
    """Same as :func:`is_near_duplicate` with caller-held byte histograms
    (the span filter compares each span against a window of k previous
    spans — recomputing the histogram k times would dominate).

    Soundness: one CHAR edit changes at most ``2 * bytes_per_char`` byte-
    histogram entries (remove up to 4 bytes, add up to 4), so
    ``L1 // per_edit`` with per_edit = 2 for pure-ASCII pairs and 8
    otherwise is a true lower bound on the char edit distance."""
    m = max(len(a), len(b))
    if m == 0:
        return True
    if abs(len(a) - len(b)) / m >= threshold:
        return False
    na, nbb = int(ha.sum()), int(hb.sum())
    per_edit = 2 if (na == len(a) and nbb == len(b)) else 8
    if (int(np.abs(ha - hb).sum()) // per_edit) / m >= threshold:
        return False
    kmax = _max_qualifying(m, threshold)
    if kmax < 0:
        return False
    return edit_distance(a, b, k=kmax) <= kmax


def token_f1(pred: str, target: str) -> float:
    """Whitespace-token F1 (metrics.py exposes the same family)."""
    p, t = pred.split(), target.split()
    if not p or not t:
        return float(p == t)
    from collections import Counter

    common = Counter(p) & Counter(t)
    n_common = sum(common.values())
    if n_common == 0:
        return 0.0
    precision = n_common / len(p)
    recall = n_common / len(t)
    return 2 * precision * recall / (precision + recall)
