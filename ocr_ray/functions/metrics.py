"""Text distance metrics (reference: /root/reference/utils/text/metrics.py).

Used by the per-document near-duplicate span filter
(base_ocr.py:716-723: normalized edit distance < 0.2 vs the last k emitted
spans) and exposed as a standalone kernel for dedup queries.
"""

from __future__ import annotations


def edit_distance(a: str, b: str) -> int:
    """Levenshtein distance, O(len(a)*len(b)) two-row DP
    (metrics.py:86-159 computes the same quantity via a full matrix)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def normalized_edit_distance(a: str, b: str) -> float:
    """edit_distance / max length, in [0, 1]."""
    m = max(len(a), len(b))
    return edit_distance(a, b) / m if m else 0.0


def is_near_duplicate(a: str, b: str, threshold: float = 0.2) -> bool:
    """Near-dup test with a cheap length prefilter: if lengths alone differ
    by more than the threshold the distance can't be below it."""
    la, lb = len(a), len(b)
    m = max(la, lb)
    if m == 0:
        return True
    if abs(la - lb) / m >= threshold:
        return False
    return normalized_edit_distance(a, b) < threshold


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
