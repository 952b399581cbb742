"""Mergeable sketches: HyperLogLog distinct counting.

The distributed-aggregation shape a 100 TB engine needs for COUNT
DISTINCT: per-batch register partials (numpy), an elementwise-max merge
(associative + commutative, so partial aggregation composes freely with
``map_batches`` + a tiny final reduce), and the standard HLL estimator
with small/large-range corrections (Flajolet et al., 2007 — public
algorithm).  Hashing is sha1-based and seedless, so estimates are
deterministic across runs and cluster sizes.
"""

from __future__ import annotations

import hashlib

import numpy as np

P = 12                  # 2^12 = 4096 registers, ~1.6% standard error
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)  # alpha_m for m >= 128


def hll_empty() -> np.ndarray:
    return np.zeros(M, dtype=np.uint8)


def _hash64(values) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        h = hashlib.sha1(str(v).encode("utf-8")).digest()
        out[i] = int.from_bytes(h[:8], "little")
    return out


def hll_add(registers: np.ndarray, values) -> np.ndarray:
    """Fold ``values`` into the register array (in place, also returned)."""
    if not len(values):
        return registers
    h = _hash64(values)
    idx = (h & np.uint64(M - 1)).astype(np.int64)
    rest = h >> np.uint64(P)
    # rank = position of the first 1-bit in the remaining 64-P bits (1-based)
    rank = np.full(len(h), 64 - P + 1, dtype=np.uint8)
    found = np.zeros(len(h), dtype=bool)
    for bit in range(64 - P):
        mask = (~found) & (((rest >> np.uint64(bit)) & np.uint64(1)) == 1)
        rank[mask] = bit + 1
        found |= mask
    np.maximum.at(registers, idx, rank)
    return registers


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Register-wise max: the associative/commutative combine."""
    return np.maximum(a, b)


def hll_estimate(registers: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting) and
    large-range corrections."""
    est = _ALPHA * M * M / np.power(2.0, -registers.astype(np.float64)).sum()
    if est <= 2.5 * M:
        zeros = int((registers == 0).sum())
        if zeros:
            return M * np.log(M / zeros)
    if est > (1 / 30) * 2**64:
        return -(2**64) * np.log(1 - est / 2**64)
    return float(est)
