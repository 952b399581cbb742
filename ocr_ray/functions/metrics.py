"""Text distance metrics (reference: /root/reference/utils/text/metrics.py).

Used by the per-document near-duplicate span filter
(base_ocr.py:716-723: normalized edit distance < 0.2 vs the last k emitted
spans) and exposed as a standalone kernel for dedup queries.
"""

from __future__ import annotations

from collections import Counter


def edit_distance(a: str, b: str) -> int:
    """Levenshtein distance (metrics.py:86-159 computes the same quantity).

    Myers' bit-parallel algorithm (Myers, JACM 1999): the DP column is held
    in arbitrary-precision int bitvectors, one word-op row per character of
    ``a`` — exact, and ~100x faster than the naive DP for the span lengths
    the near-dup filter sees in the extraction hot path."""
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


def is_near_duplicate(a: str, b: str, threshold: float = 0.2) -> bool:
    """Near-dup test with sound cheap prefilters (length diff, histogram
    L1/2): the DP only runs when the lower bound can't rule the pair out."""
    return is_near_duplicate_cached(a, Counter(a), b, Counter(b), threshold)


def is_near_duplicate_cached(
    a: str, ca: Counter, b: str, cb: Counter, threshold: float = 0.2
) -> bool:
    """Same as :func:`is_near_duplicate` with caller-held char histograms
    (the span filter compares each span against a window of k previous
    spans — recomputing the histogram k times would dominate)."""
    m = max(len(a), len(b))
    if m == 0:
        return True
    diff = sum((ca - cb).values()) + sum((cb - ca).values())
    lb = max(abs(len(a) - len(b)), (diff + 1) // 2)
    if lb / m >= threshold:
        return False
    return edit_distance(a, b) / m < threshold


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
