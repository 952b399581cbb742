"""1-D interval operators: the reference's box geometry translated to spans.

``(start, end)`` intervals over document char offsets (or event time) are
the 1-D analog of the reference's xyxy boxes (SURVEY §1.2).  Everything is
vectorized numpy over per-document arrays — no shuffle, these run inside
``map_batches`` / ``map_groups``.

Reference parity map (/root/reference/utils/image/bounding_box/):

- :func:`interval_iou` / :func:`interval_ioa`  <- metrics.py:18-71
  (pairwise IoU / intersection-over-area matrices)
- :func:`compute_groups`                        <- combination.py:21-51
  (connected components over a boolean adjacency matrix, BFS)
- :func:`combine_adjacent`                      <- combination.py:150-234
  (combine_boxes_horizontal: gap <= threshold merge, groups sorted by start)
- :func:`combine_overlapping`                   <- combination.py:331-337
  (combine_boxes_overlap: merge groups with IoA > threshold)
- :func:`union_envelope`                        <- combination.py:98-102
- :func:`nms`                                   <- non_max_suppression.py:23-78
  (greedy score-ordered suppression)
- :func:`lanms`                                 <- locality_aware_nms.py:22-127
  (iterative merge of overlapping intervals, union or score-weighted
  average, then NMS)
- :func:`sort_intervals`                        <- processing.py:20-96
  (criteria registry: start/end/length/score/reading order)
- :func:`size_filter` / :func:`region_filter`   <- filters.py:213-241,190-211
"""

from __future__ import annotations

import numpy as np


def _as_arrays(intervals) -> tuple[np.ndarray, np.ndarray]:
    arr = np.asarray(intervals, dtype=np.float64)
    if arr.size == 0:
        return np.empty(0), np.empty(0)
    return arr[:, 0], arr[:, 1]


def interval_iou(a, b) -> np.ndarray:
    """Pairwise IoU matrix [len(a), len(b)] (metrics.py:18-46)."""
    s1, e1 = _as_arrays(a)
    s2, e2 = _as_arrays(b)
    inter = np.maximum(
        0.0, np.minimum(e1[:, None], e2[None, :]) - np.maximum(s1[:, None], s2[None, :])
    )
    union = (e1 - s1)[:, None] + (e2 - s2)[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(union > 0, inter / union, 0.0)
    return out


def interval_ioa(a, b) -> np.ndarray:
    """Pairwise intersection-over-area-of-a matrix (metrics.py:48-71):
    how much of each ``a`` interval is covered by each ``b``."""
    s1, e1 = _as_arrays(a)
    s2, e2 = _as_arrays(b)
    inter = np.maximum(
        0.0, np.minimum(e1[:, None], e2[None, :]) - np.maximum(s1[:, None], s2[None, :])
    )
    area = (e1 - s1)[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(area > 0, inter / area, 0.0)
    return out


def compute_groups(adjacency: np.ndarray) -> list[list[int]]:
    """Connected components over a boolean adjacency matrix, BFS
    (combination.py:21-51).  Groups are emitted in order of their smallest
    member so output is deterministic."""
    n = adjacency.shape[0]
    seen = np.zeros(n, dtype=bool)
    groups: list[list[int]] = []
    for start in range(n):
        if seen[start]:
            continue
        queue = [start]
        seen[start] = True
        comp = []
        while queue:
            i = queue.pop()
            comp.append(i)
            neighbors = np.flatnonzero(adjacency[i] & ~seen)
            seen[neighbors] = True
            queue.extend(neighbors.tolist())
        groups.append(sorted(comp))
    return groups


def union_envelope(intervals) -> tuple[float, float]:
    """min/max envelope of a set of intervals (combination.py:98-102)."""
    s, e = _as_arrays(intervals)
    return float(s.min()), float(e.max())


def combine_adjacent(intervals, *, max_gap: float) -> tuple[np.ndarray, list[list[int]]]:
    """Merge intervals whose gap is <= ``max_gap`` into group envelopes
    (combine_boxes_horizontal, combination.py:150-234: x-gap threshold merge;
    groups ordered by start).

    Returns ``(envelopes [G,2], indices)`` where ``indices[g]`` lists the
    original positions composing group g — the reference's boxes/indices
    return shape (combination.py:341-361).
    """
    arr = np.asarray(intervals, dtype=np.float64)
    if arr.size == 0:
        return np.empty((0, 2)), []
    order = np.lexsort((arr[:, 1], arr[:, 0]))
    envelopes = []
    groups: list[list[int]] = []
    cur_s, cur_e = arr[order[0], 0], arr[order[0], 1]
    cur_idx = [int(order[0])]
    for oi in order[1:]:
        s, e = arr[oi, 0], arr[oi, 1]
        if s - cur_e <= max_gap:
            cur_e = max(cur_e, e)
            cur_idx.append(int(oi))
        else:
            envelopes.append((cur_s, cur_e))
            groups.append(cur_idx)
            cur_s, cur_e, cur_idx = s, e, [int(oi)]
    envelopes.append((cur_s, cur_e))
    groups.append(cur_idx)
    return np.asarray(envelopes), groups


def combine_overlapping(intervals, *, min_ioa: float = 0.5) -> tuple[np.ndarray, list[list[int]]]:
    """Merge intervals whose IoA exceeds ``min_ioa`` in either direction
    (combine_boxes_overlap, combination.py:331-337), via connected
    components over the IoA adjacency."""
    arr = np.asarray(intervals, dtype=np.float64)
    if arr.size == 0:
        return np.empty((0, 2)), []
    ioa = interval_ioa(arr, arr)
    adj = (ioa > min_ioa) | (ioa.T > min_ioa)
    np.fill_diagonal(adj, True)
    groups = compute_groups(adj)
    envelopes = np.asarray([union_envelope(arr[g]) for g in groups])
    order = np.lexsort((envelopes[:, 1], envelopes[:, 0]))
    return envelopes[order], [groups[i] for i in order]


def nms(intervals, scores, *, iou_threshold: float = 0.2, max_output: int | None = None):
    """Greedy NMS: keep highest-score intervals, suppress IoU > threshold
    (non_max_suppression.py:23-78; score sort at 247-253, max_output cap at
    255-259).  Ties broken by position for determinism.  Returns kept
    indices in score order."""
    arr = np.asarray(intervals, dtype=np.float64)
    sc = np.asarray(scores, dtype=np.float64)
    if arr.size == 0:
        return []
    order = np.lexsort((np.arange(len(sc)), -sc))
    iou = interval_iou(arr, arr)
    kept: list[int] = []
    suppressed = np.zeros(len(sc), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        kept.append(int(i))
        if max_output is not None and len(kept) >= max_output:
            break
        suppressed |= iou[i] > iou_threshold
    return kept


def lanms(intervals, scores, *, merge_threshold: float = 0.5, method: str = "average"):
    """Locality-aware NMS (locality_aware_nms.py:22-127): iteratively merge
    intervals overlapping by IoU > merge_threshold — ``method='union'``
    takes the envelope, ``'average'`` the score-weighted mean — then plain
    NMS on the merged set.  Returns ``(intervals [K,2], scores [K])``."""
    arr = np.asarray(intervals, dtype=np.float64).reshape(-1, 2).copy()
    sc = np.asarray(scores, dtype=np.float64).copy()
    if arr.size == 0:
        return arr, sc
    changed = True
    while changed:
        changed = False
        iou = interval_iou(arr, arr)
        np.fill_diagonal(iou, 0.0)
        pairs = np.argwhere(iou > merge_threshold)
        if len(pairs):
            i, j = sorted(pairs[0])
            if method == "union":
                merged = [min(arr[i, 0], arr[j, 0]), max(arr[i, 1], arr[j, 1])]
                msc = max(sc[i], sc[j])
            else:
                w = sc[i] + sc[j]
                merged = (arr[i] * sc[i] + arr[j] * sc[j]) / (w if w else 1.0)
                msc = w / 2.0
            keep = np.ones(len(arr), dtype=bool)
            keep[[i, j]] = False
            arr = np.vstack([arr[keep], merged])
            sc = np.concatenate([sc[keep], [msc]])
            changed = True
    kept = nms(arr, sc, iou_threshold=merge_threshold)
    return arr[kept], sc[kept]


_SORT_CRITERIA = ("start", "end", "length", "score", "reading", "column")


def sort_intervals(intervals, *, criterion: str = "reading", scores=None) -> np.ndarray:
    """Index order under a named criterion (processing.py:20-96 registry:
    x/y/w/corner/score/area/'top' reading order -> start/end/length/score/
    reading).  All sorts are stable; 'reading' is ascending start with end
    as tie-break (the 1-D reading order)."""
    arr = np.asarray(intervals, dtype=np.float64).reshape(-1, 2)
    if criterion == "start":
        return np.lexsort((np.arange(len(arr)), arr[:, 0]))
    if criterion == "end":
        return np.lexsort((np.arange(len(arr)), arr[:, 1]))
    if criterion == "length":
        return np.lexsort((np.arange(len(arr)), arr[:, 1] - arr[:, 0]))
    if criterion == "score":
        if scores is None:
            raise ValueError("score sort needs scores")
        return np.lexsort((np.arange(len(arr)), -np.asarray(scores)))
    if criterion == "reading":
        return np.lexsort((arr[:, 1], arr[:, 0]))
    if criterion == "column":
        # the reference's 'left' column-layout order (processing.py:73:
        # argsort(round(x * columns) + y) over RELATIVE coords): quantize
        # start into `columns` buckets, read down each column by end
        columns = 10.0
        return np.lexsort(
            (np.arange(len(arr)), np.round(arr[:, 0] * columns) + arr[:, 1])
        )
    raise ValueError("unknown criterion {!r}; one of {}".format(criterion, _SORT_CRITERIA))


def size_filter(intervals, *, min_length: float = 0.0, max_length: float = np.inf) -> np.ndarray:
    """Boolean mask: keep intervals within [min_length, max_length]
    (SizeFilter, filters.py:213-241)."""
    arr = np.asarray(intervals, dtype=np.float64).reshape(-1, 2)
    length = arr[:, 1] - arr[:, 0]
    return (length >= min_length) & (length <= max_length)


def region_filter(intervals, region, *, min_overlap: float = 0.5) -> np.ndarray:
    """Boolean mask: keep intervals with IoA >= min_overlap inside
    ``region`` (RegionFilter, filters.py:190-211)."""
    arr = np.asarray(intervals, dtype=np.float64).reshape(-1, 2)
    if arr.size == 0:
        return np.zeros(0, dtype=bool)
    ioa = interval_ioa(arr, np.asarray([region], dtype=np.float64))[:, 0]
    return ioa >= min_overlap


def filter_emitted(candidates, emitted, *, max_ioa: float = 0.9) -> np.ndarray:
    """Boolean mask dropping candidates covered >= max_ioa by any
    previously emitted interval (_filter_emitted_boxes, base_ocr.py:561-564)."""
    cand = np.asarray(candidates, dtype=np.float64).reshape(-1, 2)
    if cand.size == 0:
        return np.zeros(0, dtype=bool)
    em = np.asarray(emitted, dtype=np.float64).reshape(-1, 2)
    if em.size == 0:
        return np.ones(len(cand), dtype=bool)
    ioa = interval_ioa(cand, em)
    return ioa.max(axis=1) < max_ioa
