"""Interval-op unit tests: the reference's box-combination fixtures
(tests/test_utils_boxes.py:53-249,380-637) translated to 1-D intervals."""

import numpy as np
from hypothesis import given, strategies as st

from ocr_ray.functions import intervals as iv


def test_iou_basic():
    m = iv.interval_iou([(0, 10)], [(5, 15)])
    assert np.isclose(m[0, 0], 5 / 15)
    assert iv.interval_iou([(0, 10)], [(20, 30)])[0, 0] == 0.0
    assert np.isclose(iv.interval_iou([(0, 10)], [(0, 10)])[0, 0], 1.0)


def test_ioa_asymmetric():
    # small interval fully inside a big one: IoA(small, big)=1, IoA(big, small)<1
    assert np.isclose(iv.interval_ioa([(2, 4)], [(0, 10)])[0, 0], 1.0)
    assert np.isclose(iv.interval_ioa([(0, 10)], [(2, 4)])[0, 0], 0.2)


def test_compute_groups():
    adj = np.array(
        [
            [1, 1, 0, 0],
            [1, 1, 0, 0],
            [0, 0, 1, 0],
            [0, 0, 0, 1],
        ],
        dtype=bool,
    )
    assert iv.compute_groups(adj) == [[0, 1], [2], [3]]


def test_combine_adjacent_words_to_line():
    # word-box merge: gaps below threshold merge, big gap splits
    # (the test_simple fixture shape, test_utils_boxes.py:385-420)
    words = [(0, 4), (5, 9), (11, 15), (40, 44), (46, 50)]
    env, groups = iv.combine_adjacent(words, max_gap=3)
    assert env.tolist() == [[0, 15], [40, 50]]
    assert groups == [[0, 1, 2], [3, 4]]


def test_combine_adjacent_unsorted_input():
    env, groups = iv.combine_adjacent([(40, 44), (0, 4), (5, 9)], max_gap=3)
    assert env.tolist() == [[0, 9], [40, 44]]
    assert groups == [[1, 2], [0]]


def test_combine_overlapping():
    env, groups = iv.combine_overlapping([(0, 10), (2, 8), (50, 60)], min_ioa=0.5)
    assert env.tolist() == [[0, 10], [50, 60]]
    assert groups == [[0, 1], [2]]


def test_union_envelope():
    assert iv.union_envelope([(3, 7), (1, 4), (6, 9)]) == (1, 9)


def test_nms_greedy_suppression():
    spans = [(0, 10), (1, 11), (30, 40)]
    kept = iv.nms(spans, [0.9, 0.8, 0.7], iou_threshold=0.5)
    assert kept == [0, 2]
    # max_output cap (non_max_suppression.py:255-259)
    assert iv.nms(spans, [0.9, 0.8, 0.7], iou_threshold=0.99, max_output=2) == [0, 1]


def test_nms_deterministic_ties():
    kept = iv.nms([(0, 10), (20, 30)], [0.5, 0.5])
    assert kept == [0, 1]  # position tie-break


def test_lanms_union():
    spans, scores = iv.lanms(
        [(0, 10), (8, 18), (50, 60)], [1.0, 1.0, 0.5],
        merge_threshold=0.1, method="union",
    )
    assert sorted(spans.tolist()) == [[0, 18], [50, 60]]


def test_sort_criteria():
    spans = [(5, 9), (0, 10), (2, 3)]
    assert iv.sort_intervals(spans, criterion="start").tolist() == [1, 2, 0]
    assert iv.sort_intervals(spans, criterion="length").tolist() == [2, 0, 1]
    assert iv.sort_intervals(spans, criterion="score", scores=[1, 3, 2]).tolist() == [1, 2, 0]
    assert iv.sort_intervals(spans, criterion="reading").tolist() == [1, 2, 0]


def test_sort_column_layout():
    # relative [0,1] intervals (reference processing.py:73 'left' mode):
    # two "columns" — starts near 0.0 and near 0.5; within a column order
    # by end, across columns by the quantized start bucket
    spans = [(0.51, 0.6), (0.02, 0.9), (0.0, 0.1), (0.52, 0.55)]
    assert iv.sort_intervals(spans, criterion="column").tolist() == [2, 1, 3, 0]


def test_filters():
    spans = [(0, 2), (0, 50), (10, 14)]
    assert iv.size_filter(spans, min_length=3, max_length=20).tolist() == [False, False, True]
    assert iv.region_filter(spans, (0, 20), min_overlap=0.9).tolist() == [True, False, True]
    mask = iv.filter_emitted([(0, 10), (100, 110)], [(0, 9)], max_ioa=0.9)
    assert mask.tolist() == [False, True]


@given(
    st.lists(
        st.tuples(st.integers(0, 100), st.integers(1, 30)).map(lambda t: (t[0], t[0] + t[1])),
        min_size=1,
        max_size=20,
    )
)
def test_combine_adjacent_invariants(spans):
    env, groups = iv.combine_adjacent(spans, max_gap=2)
    # every input index appears exactly once
    flat = sorted(i for g in groups for i in g)
    assert flat == list(range(len(spans)))
    # envelopes are disjoint with gap > 2 and sorted
    for (s1, e1), (s2, e2) in zip(env, env[1:]):
        assert s2 - e1 > 2
        assert s1 <= s2
    # each envelope covers its members
    arr = np.asarray(spans, dtype=float)
    for (s, e), g in zip(env, groups):
        assert s == arr[g, 0].min() and e == arr[g, 1].max()
