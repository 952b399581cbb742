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
import pyarrow.compute as pc
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
    vectorized kernel per bucket.

    min/max also work on STRING value columns (r5): the kernel
    dictionary-encodes the bucket's values, ranks the (small) dictionary
    once with one Arrow sort, and reduceats over the rank lanes — still
    no per-group Python.

    Key columns may be STRING too (r5): the shuffle buckets on a
    vectorized 64-bit content hash (collisions only co-locate extra
    groups — harmless), and the kernel groups by exact string equality
    via dictionary codes, so there is NO collision risk in the result.
    Null string keys group with '' (no call site has null keys)."""
    if not 1 <= len(keys) <= 2:
        raise ValueError("bucketed_group_agg supports 1 or 2 key columns")
    for out, (op, src) in aggs.items():
        if op not in ("count", "min", "max", "sum"):
            raise ValueError(f"unsupported op {op!r} for {out!r}")
        if (src is None) != (op == "count"):
            raise ValueError(f"{out!r}: src_col must be None iff op is count")

    def add_bucket(batch: pa.Table) -> pa.Table:
        col = batch.column(keys[0])
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            from ..functions.strhash import SEED_A, hash_strings_u64

            k0 = hash_strings_u64(pc.fill_null(col, ""), SEED_A)
        else:
            k0 = col.to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__bucket", pa.array(_bucket_of(k0, n_buckets), pa.int64())
        )

    def key_lane(tbl: pa.Table, name: str):
        """(int64 sort lane, dictionary-or-None) for a key column: equal
        lane values <=> equal keys within this bucket's rows."""
        col = tbl.column(name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            enc = pc.fill_null(col, "").dictionary_encode()
            return np.asarray(enc.indices, dtype=np.int64), enc.dictionary
        return col.to_numpy(zero_copy_only=False), None

    def emit_key(lane_vals: np.ndarray, dictionary) -> pa.Array:
        if dictionary is not None:
            return dictionary.take(pa.array(lane_vals, pa.int64()))
        return pa.array(lane_vals.astype(np.int64), pa.int64())

    def kernel(tbl: pa.Table) -> pa.Table:
        k0, d0 = key_lane(tbl, keys[0])
        if len(keys) == 2:
            k1, d1 = key_lane(tbl, keys[1])
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
        out = {keys[0]: emit_key(a[starts], d0)}
        if b is not None:
            out[keys[1]] = emit_key(b[starts], d1)
        for name, (op, src) in aggs.items():
            if op == "count":
                v = np.diff(np.append(starts, len(a)))
            else:
                src_col = tbl.column(src)
                if isinstance(src_col, pa.ChunkedArray):
                    src_col = src_col.combine_chunks()
                if pa.types.is_string(src_col.type) or pa.types.is_large_string(
                    src_col.type
                ):
                    if op == "sum":
                        raise ValueError(f"{name!r}: cannot sum a string column")
                    # string min/max without per-group Python: dictionary-
                    # encode, rank the (small) dictionary by one Arrow
                    # sort, reduceat over the ranks, map back
                    enc = src_col.dictionary_encode()
                    d = enc.dictionary
                    sort_idx = np.asarray(pc.sort_indices(d), dtype=np.int64)
                    rank = np.empty(len(d), np.int64)
                    rank[sort_idx] = np.arange(len(d), dtype=np.int64)
                    codes = rank[np.asarray(enc.indices, dtype=np.int64)][order]
                    fn = (
                        np.minimum.reduceat if op == "min" else np.maximum.reduceat
                    )
                    won = fn(codes, starts)
                    out[name] = d.take(
                        pa.array(sort_idx[won], pa.int64())
                    )
                    continue
                col = src_col.to_numpy(zero_copy_only=False)[order]
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
