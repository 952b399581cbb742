"""Bucketed vectorized group-aggregate for HIGH-CARDINALITY integer keys.

Ray's native ``groupby().aggregate()`` pays a per-GROUP overhead (~30 us
per group measured on this box: a 225k-row count over 215k distinct keys
costs 7.6 s regardless of key type — BASELINE.md round-4 finding #4).
That is invisible at bounded group counts (vocab, langs, buckets) and
fatal at data-proportional ones (content hashes, doc ids: 10^10 groups at
100 TB = ~80 CPU-hours of pure overhead).

This stage keeps the same all-to-all but reduces each partition with ONE
lexsort + run-length/``reduceat`` numpy kernel per coarse bucket — the
same medicine as the extraction path's assemble_bucket lesson (one Python
call per bucket, never per key).  Supported: 1-2 int64 key columns,
count/min/max/sum over int64 values.  Exactness: bitwise — the kernel is
a deterministic regrouping of the same rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_KNUTH = np.uint64(2654435761)


def _bucket_of(col: np.ndarray, n_buckets: int) -> np.ndarray:
    """Multiplicative hash bucket — required for LOW-entropy keys (dense
    ids); harmless for hash lanes."""
    return ((col.astype(np.uint64, copy=False) * _KNUTH) % np.uint64(n_buckets)).astype(
        np.int64
    )


def bucketed_group_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    aggs: dict[str, tuple[str, str | None]],
    *,
    n_buckets: int = 256,
) -> ray.data.Dataset:
    """GROUP BY ``keys`` (1-2 int64 columns) computing ``aggs`` — a dict of
    ``out_col -> (op, src_col)`` with op in count/min/max/sum (src_col is
    None for count).  One shuffle over ``n_buckets`` coarse groups, one
    vectorized kernel per bucket."""
    if not 1 <= len(keys) <= 2:
        raise ValueError("bucketed_group_agg supports 1 or 2 key columns")
    for out, (op, src) in aggs.items():
        if op not in ("count", "min", "max", "sum"):
            raise ValueError(f"unsupported op {op!r} for {out!r}")
        if (src is None) != (op == "count"):
            raise ValueError(f"{out!r}: src_col must be None iff op is count")

    def add_bucket(batch: pa.Table) -> pa.Table:
        k0 = batch.column(keys[0]).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__bucket", pa.array(_bucket_of(k0, n_buckets), pa.int64())
        )

    def kernel(tbl: pa.Table) -> pa.Table:
        k0 = tbl.column(keys[0]).to_numpy(zero_copy_only=False)
        if len(keys) == 2:
            k1 = tbl.column(keys[1]).to_numpy(zero_copy_only=False)
            order = np.lexsort((k1, k0))
            a, b = k0[order], k1[order]
            new = np.empty(len(a), bool)
            new[0] = True
            new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        else:
            order = np.argsort(k0, kind="stable")
            a = k0[order]
            b = None
            new = np.empty(len(a), bool)
            new[0] = True
            new[1:] = a[1:] != a[:-1]
        starts = np.flatnonzero(new)
        out = {keys[0]: pa.array(a[starts], pa.int64())}
        if b is not None:
            out[keys[1]] = pa.array(b[starts], pa.int64())
        for name, (op, src) in aggs.items():
            if op == "count":
                v = np.diff(np.append(starts, len(a)))
            else:
                col = tbl.column(src).to_numpy(zero_copy_only=False)[order]
                fn = {
                    "min": np.minimum.reduceat,
                    "max": np.maximum.reduceat,
                    "sum": np.add.reduceat,
                }[op]
                v = fn(col, starts)
            if op != "count" and np.issubdtype(v.dtype, np.floating):
                # min/max over floats are exact and order-independent;
                # keep the dtype instead of silently truncating to int
                out[name] = pa.array(v.astype(np.float64), pa.float64())
            else:
                out[name] = pa.array(v.astype(np.int64), pa.int64())
        return pa.table(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pyarrow")
    )


def tree_merge_partials(
    parts: ray.data.Dataset,
    merge_batch,
    *,
    n_buckets: int = 32,
) -> list[dict]:
    """In-cluster tree merge of mergeable-sketch partial ROWS (Bloom
    bitsets, HLL registers, Misra-Gries summaries, KLL sketches — any
    associative/commutative combine).

    The anti-pattern this replaces (VERDICT r4 #4): ``take_all()`` over
    one-partial-per-batch rows lands O(#batches) partials on the driver —
    at 10^6 batches the 128 KiB Bloom case alone is ~130 GB through one
    process.  Here:

    - level 1 folds every partial INSIDE its block (``batch_size=None``,
      no shuffle) -> one row per block;
    - level 2 hashes the per-block rows into ``n_buckets`` groups
      (content-hash bucket — deterministic, no RNG) and folds each group
      in one ``map_groups`` task.

    ``merge_batch(tbl) -> tbl`` must fold any number of partial rows into
    exactly one.  Returns the <= ``n_buckets`` merged rows; the driver
    finishes with a bounded fold, never an O(#batches) loop."""
    import pickle
    import zlib

    l1 = parts.map_batches(merge_batch, batch_format="pyarrow", batch_size=None)

    def add_bucket(batch: pa.Table) -> pa.Table:
        bks = [
            zlib.crc32(pickle.dumps(batch.slice(i, 1).to_pydict())) % n_buckets
            for i in range(batch.num_rows)
        ]
        return batch.append_column("__b", pa.array(bks, pa.int64()))

    def fold(group: pa.Table) -> pa.Table:
        return merge_batch(group.drop_columns(["__b"]))

    merged = (
        l1.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(fold, batch_format="pyarrow")
    )
    return [r for r in merged.take_all() if r]
