from hypothesis import given, strategies as st

from ocr_ray.functions.metrics import (
    edit_distance,
    is_near_duplicate,
    normalized_edit_distance,
    token_f1,
)


def test_edit_distance_basic():
    assert edit_distance("", "") == 0
    assert edit_distance("abc", "abc") == 0
    assert edit_distance("abc", "abd") == 1
    assert edit_distance("abc", "") == 3
    assert edit_distance("kitten", "sitting") == 3


@given(st.text(max_size=30), st.text(max_size=30))
def test_edit_distance_symmetric_bounded(a, b):
    d = edit_distance(a, b)
    assert d == edit_distance(b, a)
    assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))


def test_near_duplicate():
    s = "the quick brown fox jumps over the lazy dog"
    assert is_near_duplicate(s, s)
    assert is_near_duplicate(s, s[:-3] + "cat")
    assert not is_near_duplicate(s, "completely different text here entirely")
    assert normalized_edit_distance("ab", "cd") == 1.0


def test_token_f1():
    assert token_f1("a b c", "a b c") == 1.0
    assert token_f1("a b", "c d") == 0.0
    assert 0 < token_f1("a b c d", "a b x y") < 1
