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


#: seed for the vectorized string-hash path (value is arbitrary but FIXED:
#: estimates must be deterministic across runs and cluster sizes)
_STR_SEED = 0x243F6A8885A308D3


def _hash64(values) -> np.ndarray:
    """Deterministic uint64 content hashes.  Arrow string arrays and str
    sequences run through the vectorized strhash polynomial kernel (no
    per-value Python — the per-token sha1 loop was the HLL partial's
    bottleneck at corpus scale, VERDICT r4 #5 family); non-string values
    fall back to per-value sha1 (cold path, small inputs only)."""
    import pyarrow as pa

    from .strhash import hash_strings_u64

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array) and (
        pa.types.is_string(values.type) or pa.types.is_large_string(values.type)
    ):
        return hash_strings_u64(values, _STR_SEED)
    vals = list(values)
    if vals and all(type(v) is str for v in vals):
        return hash_strings_u64(pa.array(vals, pa.string()), _STR_SEED)
    out = np.empty(len(vals), dtype=np.uint64)
    for i, v in enumerate(vals):
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


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable frequent-items summary)
# ---------------------------------------------------------------------------
#
# The bounded-memory counterpart of exact top-k token counting: a k-counter
# summary whose guarantee is that every item with true frequency > n/k is
# PRESENT in the summary, and each reported count undershoots the true count
# by at most n/k (Misra & Gries 1982; merge rule from Agarwal et al. 2012 —
# public algorithms).  Summaries merge by counter addition + a rank-k
# decrement, so per-batch partials compose exactly like the HLL registers.


def mg_empty() -> dict:
    return {}


def mg_add(summary: dict, values, k: int = 64) -> dict:
    """Fold ``values`` into a k-counter Misra-Gries summary (in place)."""
    for v in values:
        if v in summary:
            summary[v] += 1
        elif len(summary) < k - 1:
            summary[v] = 1
        else:  # decrement-all step, dropping zeroed counters
            dead = []
            for key in summary:
                summary[key] -= 1
                if summary[key] == 0:
                    dead.append(key)
            for key in dead:
                del summary[key]
    return summary


def mg_merge(a: dict, b: dict, k: int = 64) -> dict:
    """Merge two summaries: add counters, then subtract the k-th largest
    count and drop non-positive counters (keeps the n/k error bound
    additive across merges)."""
    out = dict(a)
    for key, c in b.items():
        out[key] = out.get(key, 0) + c
    if len(out) >= k:
        kth = sorted(out.values(), reverse=True)[k - 1]
        out = {key: c - kth for key, c in out.items() if c - kth > 0}
    return out


def mg_topk(summary: dict, n: int) -> list:
    """Top-n (item, lower-bound count) pairs, count desc then item asc."""
    return sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))[:n]


# ---------------------------------------------------------------------------
# Bloom filter (mergeable membership set — the incremental-dedup seen-set)
# ---------------------------------------------------------------------------
#
# Deterministic double hashing (Kirsch-Mitzenmacher 2006, public algorithm)
# over the same seedless sha1 as the HLL: h_i = h1 + i*h2.  Bitsets merge by
# OR, so per-shard partials compose; no false negatives, FPR ~ (1-e^{-kn/m})^k.

BLOOM_BITS = 1 << 20   # 128 KiB bitset
BLOOM_K = 7


def bloom_empty() -> np.ndarray:
    return np.zeros(BLOOM_BITS // 8, dtype=np.uint8)


def _bloom_positions(values) -> np.ndarray:
    h = _hash64(values)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = (h >> np.uint64(32)).astype(np.uint64) | np.uint64(1)
    i = np.arange(BLOOM_K, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(BLOOM_BITS)).astype(np.int64)


def bloom_add(bits: np.ndarray, values) -> np.ndarray:
    if not len(values):
        return bits
    pos = _bloom_positions(values).ravel()
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bits


def bloom_contains(bits: np.ndarray, values) -> np.ndarray:
    """Vectorized membership test: True = possibly present (no false
    negatives), False = definitely absent."""
    if not len(values):
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(values)
    present = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return present.all(axis=0).astype(bool)


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.bitwise_or(a, b)


# --- integer-key fast path (round 4) ---------------------------------------
#
# The string Bloom above hashes per element in Python (sha1) — fine for the
# sketch queries' bounded partials, wrong for a JOIN prefilter that touches
# every fact row.  Integer keys get a fully vectorized splitmix64
# (Steele/Lea/Flood 2014, public domain mixer) feeding the same
# Kirsch-Mitzenmacher double hashing and the same bitset layout, so
# int-keyed and string-keyed filters merge with the same bloom_merge.


def hash64_ints(values: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over an int64/uint64 array."""
    with np.errstate(over="ignore"):
        z = values.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _bloom_positions_ints(keys: np.ndarray) -> np.ndarray:
    h = hash64_ints(keys)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = (h >> np.uint64(32)).astype(np.uint64) | np.uint64(1)
    i = np.arange(BLOOM_K, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(BLOOM_BITS)).astype(
            np.int64
        )


def bloom_add_ints(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    if not len(keys):
        return bits
    pos = _bloom_positions_ints(keys).ravel()
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bits


def bloom_contains_ints(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership: True = possibly present, False = definitely
    absent — zero Python per row."""
    if not len(keys):
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions_ints(keys)
    present = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return present.all(axis=0).astype(bool)


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode-Muthukrishnan 2005, public algorithm)
# ---------------------------------------------------------------------------
#
# Mergeable point-frequency estimates: d rows of w counters, update/query
# via the same splitmix64 double hashing as the int Bloom.  Estimates are
# NEVER below the true count (one-sided error <= eps*N w.p. 1-delta);
# partials merge by elementwise +.

CM_W = 1 << 12
CM_D = 4


def cm_empty() -> np.ndarray:
    return np.zeros((CM_D, CM_W), dtype=np.int64)


def _cm_positions(keys: np.ndarray) -> np.ndarray:
    h = hash64_ints(np.asarray(keys))
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = (h >> np.uint64(32)).astype(np.uint64) | np.uint64(1)
    i = np.arange(CM_D, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(CM_W)).astype(np.int64)


def cm_add(cm: np.ndarray, keys: np.ndarray) -> np.ndarray:
    if not len(keys):
        return cm
    pos = _cm_positions(keys)
    for d in range(CM_D):
        np.add.at(cm[d], pos[d], 1)
    return cm


def cm_query(cm: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized point estimates: min over the d counter rows."""
    if not len(keys):
        return np.zeros(0, dtype=np.int64)
    pos = _cm_positions(keys)
    return np.min(
        np.stack([cm[d][pos[d]] for d in range(CM_D)], axis=0), axis=0
    )


def cm_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


# ---------------------------------------------------------------------------
# KLL-style mergeable quantile sketch (Karnin-Lang-Liberty 2016, public
# algorithm, simplified: equal capacity k per level)
# ---------------------------------------------------------------------------
#
# Why it exists next to the exact value-histogram quantiles (len_quantiles):
# the histogram needs driver state ~ #DISTINCT values — exact and cheap for
# bounded integer domains, impossible for continuous doubles at 100 TB.  The
# KLL sketch holds O(k log(n/k)) values total regardless of distribution.
#
# Level L holds items of weight 2^L.  A full level is sorted and every other
# item promoted (deterministic alternating offset per level so runs are
# reproducible; the classic random offset only improves constants).  Partial
# sketches merge by level-wise concatenation + the same compaction — the
# map_batches partial / driver-combine shape of the other sketches.

KLL_K = 200


def kll_empty(k: int = KLL_K) -> dict:
    return {"k": k, "levels": [[]], "n": 0, "parity": 0}


def _kll_compact(sk: dict) -> None:
    k = sk["k"]
    for lvl in range(len(sk["levels"])):
        buf = sk["levels"][lvl]
        if len(buf) <= k:
            continue
        buf.sort()
        off = sk["parity"] & 1
        sk["parity"] += 1
        promoted = buf[off::2]
        sk["levels"][lvl] = []
        if lvl + 1 == len(sk["levels"]):
            sk["levels"].append([])
        sk["levels"][lvl + 1].extend(promoted)


def kll_add(sk: dict, values) -> dict:
    vals = np.asarray(values, dtype=np.float64)
    sk["n"] += len(vals)
    buf = sk["levels"][0]
    k = sk["k"]
    for i in range(0, len(vals), k):
        buf.extend(vals[i : i + k].tolist())
        if len(buf) > k:
            _kll_compact(sk)
            buf = sk["levels"][0]
    return sk


def kll_merge(a: dict, b: dict) -> dict:
    out = kll_empty(min(a["k"], b["k"]))
    out["n"] = a["n"] + b["n"]
    out["parity"] = a["parity"] + b["parity"]
    depth = max(len(a["levels"]), len(b["levels"]))
    while len(out["levels"]) < depth:
        out["levels"].append([])
    for sk in (a, b):
        for lvl, buf in enumerate(sk["levels"]):
            out["levels"][lvl].extend(buf)
    _kll_compact(out)
    return out


def kll_quantiles(sk: dict, qs) -> np.ndarray:
    """Estimate quantiles: weighted order statistics over all retained
    items (weight 2^level)."""
    vals, wts = [], []
    for lvl, buf in enumerate(sk["levels"]):
        vals.extend(buf)
        wts.extend([1 << lvl] * len(buf))
    if not vals:
        return np.full(len(list(qs)), np.nan)
    v = np.asarray(vals)
    w = np.asarray(wts, dtype=np.float64)
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w) - w / 2.0
    total = w.sum()
    return np.interp(np.asarray(list(qs), dtype=np.float64) * total, cum, v)
