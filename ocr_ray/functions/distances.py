"""Vector distance registry (reference utils/distances.py:24-133).

The reference registers distance/similarity kernels by name behind one
``distance(x, y, method, as_matrix=...)`` entry point and builds ``knn``
on top; same surface here over plain numpy.  Every kernel accepts

- ``x``: [D] or [N, D], ``y``: [D] or [M, D]
- ``as_matrix=False``: paired mode (broadcasts a single vector)
- ``as_matrix=True``: full [N, M] matrix

Similarities (cosine, dot, dice) rank DESCENDING in knn; distances
ascending — mirroring the reference's ``is_similarity`` flag.
"""

from __future__ import annotations

import numpy as np

_REGISTRY: dict[str, tuple] = {}


def _register(name, is_similarity=False):
    def wrapper(fn):
        _REGISTRY[name] = (fn, is_similarity)
        return fn

    return wrapper


def _as2d(v) -> np.ndarray:
    a = np.asarray(v, dtype=np.float64)
    return a[None, :] if a.ndim == 1 else a


@_register("cosine", is_similarity=True)
def cosine_similarity(x, y, *, as_matrix=False):
    x, y = _as2d(x), _as2d(y)
    nx = np.linalg.norm(x, axis=1)
    ny = np.linalg.norm(y, axis=1)
    nx[nx == 0] = 1.0
    ny[ny == 0] = 1.0
    if as_matrix:
        return (x @ y.T) / (nx[:, None] * ny[None, :])
    return (x * y).sum(axis=1) / (nx * ny)


@_register("dot", is_similarity=True)
def dot_product(x, y, *, as_matrix=False):
    x, y = _as2d(x), _as2d(y)
    return x @ y.T if as_matrix else (x * y).sum(axis=1)


@_register("l1")
@_register("manhattan")
def manhattan_distance(x, y, *, as_matrix=False):
    x, y = _as2d(x), _as2d(y)
    if as_matrix:
        return np.abs(x[:, None, :] - y[None, :, :]).sum(axis=2)
    return np.abs(x - y).sum(axis=1)


@_register("l2")
@_register("euclidian")
def euclidian_distance(x, y, *, as_matrix=False):
    x, y = _as2d(x), _as2d(y)
    if as_matrix:
        # ||x-y||^2 = ||x||^2 + ||y||^2 - 2 x.y (the reference 'fast' path)
        d2 = (
            (x ** 2).sum(axis=1)[:, None]
            + (y ** 2).sum(axis=1)[None, :]
            - 2 * (x @ y.T)
        )
        return np.sqrt(np.maximum(d2, 0.0))
    return np.linalg.norm(x - y, axis=1)


@_register("dice", is_similarity=True)
def dice_coeff(x, y, *, as_matrix=False):
    x, y = _as2d(x), _as2d(y)
    if as_matrix:
        inter = np.minimum(x[:, None, :], y[None, :, :]).sum(axis=2)
        total = x.sum(axis=1)[:, None] + y.sum(axis=1)[None, :]
    else:
        inter = np.minimum(x, y).sum(axis=1)
        total = x.sum(axis=1) + y.sum(axis=1)
    total = np.where(total == 0, 1.0, total)
    return 2.0 * inter / total


def distance(x, y, method: str, *, as_matrix: bool = False):
    """Dispatch by registered name (distances.py:39-83)."""
    if method not in _REGISTRY:
        raise ValueError(
            "Unknown distance method {!r} (accepted: {})".format(
                method, sorted(_REGISTRY)
            )
        )
    fn, _sim = _REGISTRY[method]
    return fn(x, y, as_matrix=as_matrix)


def is_similarity(method: str) -> bool:
    return _REGISTRY[method][1]


def knn(query, points, *, k: int = 10, method: str = "cosine") -> np.ndarray:
    """Indices of the k nearest ``points`` to ``query`` under ``method``
    (distances.py:134-208): similarities take the largest, distances the
    smallest; ties break by index (stable)."""
    scores = distance(query, points, method, as_matrix=True)[0]
    order = np.argsort(-scores if is_similarity(method) else scores, kind="stable")
    return order[:k]
