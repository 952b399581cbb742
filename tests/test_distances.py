"""Distance registry tests (reference utils/distances.py:24-208)."""

import numpy as np
import pytest

from ocr_ray.functions import distances as D


def test_registry_dispatch_and_unknown():
    x, y = np.array([1.0, 0.0]), np.array([0.0, 1.0])
    assert D.distance(x, x, "cosine") == pytest.approx([1.0])
    assert D.distance(x, y, "cosine") == pytest.approx([0.0])
    assert D.distance(x, y, "l2") == pytest.approx([np.sqrt(2)])
    assert D.distance(x, y, "l1") == pytest.approx([2.0])
    assert D.distance(x, y, "manhattan") == pytest.approx([2.0])
    assert D.distance(x, y, "dot") == pytest.approx([0.0])
    with pytest.raises(ValueError, match="Unknown distance"):
        D.distance(x, y, "nope")


def test_matrix_modes_match_paired():
    rng = np.random.RandomState(3)
    X = rng.standard_normal((4, 6))
    Y = rng.standard_normal((5, 6))
    for method in ("cosine", "dot", "l1", "l2"):
        M = D.distance(X, Y, method, as_matrix=True)
        assert M.shape == (4, 5)
        for i in range(4):
            for j in range(5):
                pair = D.distance(X[i], Y[j], method)[0]
                assert M[i, j] == pytest.approx(pair)


def test_l2_fast_path_nonnegative():
    # the ||x||^2+||y||^2-2xy trick must clamp tiny negative residuals
    x = np.ones((1, 8))
    assert (D.distance(x, x, "l2", as_matrix=True) >= 0).all()


def test_dice_counts():
    a = np.array([1.0, 1.0, 0.0])
    b = np.array([1.0, 0.0, 0.0])
    assert D.distance(a, b, "dice") == pytest.approx([2 * 1.0 / 3.0])


def test_knn_similarity_vs_distance():
    pts = np.array([[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [-1.0, 0.0]])
    q = np.array([1.0, 0.0])
    assert D.knn(q, pts, k=2, method="cosine").tolist() == [0, 1]
    assert D.knn(q, pts, k=2, method="l2").tolist() == [0, 1]
    assert D.knn(q, pts, k=1, method="l2")[0] == 0
