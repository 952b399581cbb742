"""Generic resumable partitioned writer — the extraction write path
(pipelines/extraction.py:200-243) generalized to ANY keyed Dataset, so
curation outputs (dedup winners, filtered corpora, per-source samples) get
the same guarantees the extraction output has:

- output lands as ``partition_id=N/`` parquet directories (key-hash
  partitioned, deterministic), never one giant file;
- each finished partition commits a lineage manifest row (rows, key
  digest) atomically AFTER its files land (state/manifest.py);
- a rerun skips committed partitions with a map-side filter against the
  broadcast done-set (no driver scan of prior output), deletes debris of
  partitions that died between write and commit, and recomputes only the
  missing key ranges.

The per-partition stats fold in the SAME pipeline pass as the write (one
tiny (pid, n_rows, key_sum) partial per task, one groupby) — only
``<= n_partitions`` stat rows ever reach the driver.
"""

from __future__ import annotations

import os
import shutil
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..state import manifest as mf

_U64 = (1 << 64) - 1


def _key_partition_ids(col: pa.ChunkedArray, n_partitions: int) -> np.ndarray:
    """Deterministic partition ids for an int or string key column
    (Knuth multiplicative hash for ints, crc32 for strings — never
    Python's salted hash)."""
    if pa.types.is_integer(col.type):
        vals = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return ((vals * np.uint64(2654435761)) % n_partitions).astype(np.int64)
    return np.array(
        [zlib.crc32(str(v).encode("utf-8")) % n_partitions for v in col.to_pylist()],
        dtype=np.int64,
    )


def _content_digest(tbl: pa.Table) -> str:
    """Deterministic 16-hex digest over the table's FULL serialized rows
    (Arrow IPC stream bytes) — identical content -> identical name."""
    import hashlib

    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return hashlib.sha256(sink.getvalue()).hexdigest()[:16]


#: Per-task write sequence: distinguishes byte-identical blocks written by
#: the SAME task (same task id + content digest + row count would collide
#: and silently overwrite, under-writing rows the manifest counted).  Each
#: (process, task) execution also draws a random ATTEMPT SALT: a retried
#: task — whether on a fresh worker or a REUSED one (Ray reuses worker
#: processes, so a process-global counter alone would keep counting and
#: leave the first attempt's files behind) — carries a different salt, and
#: every write first sweeps same-task files bearing a foreign salt from the
#: partition dir it touches.  Deterministic blocks => a retry touches the
#: same partitions, so all prior-attempt debris is swept before commit.
_TASK_SEQ: dict = {}


def _task_salt_seq(task_id: str) -> tuple:
    import uuid

    salt, n = _TASK_SEQ.get(task_id, (None, 0))
    if salt is None:
        salt = uuid.uuid4().hex[:8]
    _TASK_SEQ[task_id] = (salt, n + 1)
    return salt, n


def _key_sum(col) -> int:
    """Order-insensitive, duplicate-sensitive key digest (sum of crc32s
    mod 2^64 — manifest.combine_digests' combine rule)."""
    acc = 0
    for v in col.to_pylist():
        acc = (acc + zlib.crc32(str(v).encode("utf-8"))) & _U64
    return acc


def _write_jsonl(tbl: pa.Table, path: str) -> None:
    # pandas' C json writer — vectorized, no Python loop over rows
    tbl.to_pandas().to_json(
        path, orient="records", lines=True, force_ascii=False,
        date_format="iso", date_unit="us",
    )


def _read_jsonl(path: str) -> pa.Table:
    from pyarrow import json as pj

    return pj.read_json(path)


def _write_csv(tbl: pa.Table, path: str) -> None:
    from pyarrow import csv as pcsv

    pcsv.write_csv(tbl, path)


def _read_csv(path: str) -> pa.Table:
    from pyarrow import csv as pcsv

    return pcsv.read_csv(path)


#: Sink format registry: extension, vectorized writer, reader.  Parquet is
#: the canonical store; jsonl/csv are interchange sinks (the reference's
#: JSONSaver / FileSaver shapes, `utils/databases/json_dir.py` /
#: `models/saving.py`) with the usual interchange caveats (csv erases the
#: null-vs-empty-string distinction; jsonl renders timestamps as ISO text).
FORMATS = {
    "parquet": (".parquet", pq.write_table, pq.read_table),
    "jsonl": (".jsonl", _write_jsonl, _read_jsonl),
    "csv": (".csv", _write_csv, _read_csv),
}


def write_partitioned(
    ds: ray.data.Dataset,
    output_dir: str,
    *,
    key: str,
    n_partitions: int = 64,
    format: str = "parquet",
) -> dict:
    """Write ``ds`` as resumable key-partitioned files in ``format``
    (``parquet`` | ``jsonl`` | ``csv`` — see ``FORMATS``).  Returns
    ``{"written": rows_written_this_run, "skipped_partitions": N}``.
    All resume / debris / manifest guarantees hold for every format; the
    file body serializer is the only thing that changes."""
    ext, write_fn, _ = FORMATS[format]
    mf.purge_mismatched(output_dir, n_partitions)
    done = set(mf.completed_partitions(output_dir, n_partitions=n_partitions))
    _clean_debris(output_dir, committed=done)
    done_ref = ray.put(frozenset(done))

    def assign_and_skip(batch: pa.Table) -> pa.Table:
        pids = _key_partition_ids(batch.column(key), n_partitions)
        batch = batch.append_column("__pid", pa.array(pids, pa.int64()))
        skip = ray.get(done_ref)
        if skip:
            keep = np.array([p not in skip for p in pids], dtype=bool)
            batch = batch.filter(pa.array(keep))
        return batch

    def write_files(batch: pa.Table) -> pa.Table:
        pids = batch.column("__pid").to_numpy(zero_copy_only=False)
        try:
            task_id = ray.get_runtime_context().get_task_id() or "driver"
        except Exception:
            task_id = "driver"
        out_pid, out_rows, out_sum = [], [], []
        for pid in np.unique(pids):
            part = batch.filter(pa.array(pids == pid)).drop_columns(["__pid"])
            ks = _key_sum(part.column(key))
            pdir = os.path.join(output_dir, "partition_id={}".format(int(pid)))
            os.makedirs(pdir, exist_ok=True)
            # file name = task id + attempt salt + per-task sequence +
            # content digest: distinct blocks AND byte-identical blocks
            # from the same task land as distinct files; a retried task
            # carries a different salt, and sweeping same-task foreign-salt
            # files from every partition dir it touches removes the failed
            # attempt's debris before this attempt's file lands
            salt, seq = _task_salt_seq(task_id)
            prefix = "part-{}-".format(task_id[:12])
            for old in os.listdir(pdir):
                if old.startswith(prefix) and "-{}-".format(salt) not in old:
                    os.remove(os.path.join(pdir, old))
            content = _content_digest(part)
            fname = "part-{}-{}-{}-{}-{}{}".format(
                task_id[:12], salt, seq, content, part.num_rows, ext
            )
            write_fn(part, os.path.join(pdir, fname))
            out_pid.append(int(pid))
            out_rows.append(part.num_rows)
            out_sum.append(ks)
        return pa.table(
            {
                "partition_id": pa.array(out_pid, pa.int64()),
                "n_rows": pa.array(out_rows, pa.int64()),
                "key_sum": pa.array(out_sum, pa.int64()),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        pid = group.column("partition_id")[0].as_py()
        n = sum(group.column("n_rows").to_pylist())
        s = sum(group.column("key_sum").to_pylist()) & _U64
        return pa.table(
            {
                "partition_id": pa.array([pid], pa.int64()),
                "n_rows": pa.array([n], pa.int64()),
                "key_sum": pa.array([s], pa.int64()),
            }
        )

    stats = (
        ds.map_batches(assign_and_skip, batch_format="pyarrow")
        .map_batches(write_files, batch_format="pyarrow", batch_size=None)
        .groupby("partition_id")
        .map_groups(combine, batch_format="pyarrow")
        .take_all()  # <= n_partitions rows
    )
    written = 0
    for r in stats:
        digest = "{:016x}".format(int(r["key_sum"]) & _U64)
        mf.commit_partition(
            output_dir,
            int(r["partition_id"]),
            n_docs=int(r["n_rows"]),
            input_digest=digest,
            output_digest=digest,
            n_partitions=n_partitions,
        )
        written += int(r["n_rows"])
    return {"written": written, "skipped_partitions": len(done)}


def _clean_debris(output_dir: str, *, committed=frozenset()) -> int:
    if not os.path.isdir(output_dir):
        return 0
    removed = 0
    for name in os.listdir(output_dir):
        if not name.startswith("partition_id="):
            continue
        if int(name.split("=", 1)[1]) not in committed:
            shutil.rmtree(os.path.join(output_dir, name), ignore_errors=True)
            removed += 1
    return removed


def compact_partitioned(
    output_dir: str,
    *,
    target_bytes: int = 128 << 20,
) -> dict:
    """Small-files compaction over a committed ``write_partitioned``
    output: every partition whose parquet files are smaller than
    ``target_bytes`` in aggregate-per-file terms is rewritten into
    ~``ceil(total/target)`` right-sized files.  The lakehouse maintenance
    pass — streaming writers land one file per (task, partition) and a
    100 TB run leaves millions of KB-sized files that throttle every
    later scan.

    Guarantees:

    - manifest rows stay authoritative: each partition's row count and
      key digest are UNCHANGED (compaction re-groups bytes, never rows),
      so committed lineage remains valid and resume semantics survive;
    - crash-safe: compacted files build in a hidden ``.compact-N.tmp``
      sibling (invisible to read_partitioned/_clean_debris), row counts
      are validated, then the swap is two renames — a crash leaves either
      the old files or the new ones, never both visible;
    - distributed: one Ray task per partition via ``map_batches`` over
      the partition-id list (file-level work, no data shuffle).

    Parquet-only by design: jsonl/csv are interchange sinks, not scan
    stores — partitions holding non-parquet files are left untouched.
    """
    import glob

    done = mf.completed_partitions(output_dir)
    # sweep orphaned temp dirs of a previous compaction crash
    for tmp in glob.glob(os.path.join(output_dir, ".compact-*.tmp")) + glob.glob(
        os.path.join(output_dir, ".old-*.tmp")
    ):
        shutil.rmtree(tmp, ignore_errors=True)
    if not done:
        return {"compacted_partitions": 0, "files_before": 0, "files_after": 0}

    def compact_one(batch: pa.Table) -> pa.Table:
        out_pid, out_before, out_after = [], [], []
        for pid in batch.column("pid").to_pylist():
            pdir = os.path.join(output_dir, "partition_id={}".format(pid))
            files = sorted(
                f for f in os.listdir(pdir) if f.endswith(".parquet")
            )
            paths = [os.path.join(pdir, f) for f in files]
            total = sum(os.path.getsize(p) for p in paths)
            n_out = max(1, -(-total // target_bytes))  # ceil
            if len(files) <= n_out:  # already right-sized
                out_pid.append(pid)
                out_before.append(len(files))
                out_after.append(len(files))
                continue
            tbl = pa.concat_tables(pq.read_table(p) for p in paths)
            tmp = os.path.join(output_dir, ".compact-{}.tmp".format(pid))
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp)
            rows_per = -(-tbl.num_rows // n_out)
            written_rows = 0
            k = 0
            for k in range(int(n_out)):
                part = tbl.slice(k * rows_per, rows_per)
                if part.num_rows == 0:
                    break
                pq.write_table(
                    part,
                    os.path.join(
                        tmp, "compact-{}-{}.parquet".format(_content_digest(part), k)
                    ),
                )
                written_rows += part.num_rows
            if written_rows != tbl.num_rows:  # defensive; cannot happen
                shutil.rmtree(tmp, ignore_errors=True)
                raise RuntimeError("compaction row mismatch on partition %d" % pid)
            old = os.path.join(output_dir, ".old-{}.tmp".format(pid))
            os.rename(pdir, old)
            os.rename(tmp, pdir)
            shutil.rmtree(old, ignore_errors=True)
            out_pid.append(pid)
            out_before.append(len(files))
            out_after.append(len(os.listdir(pdir)))
        return pa.table(
            {
                "pid": pa.array(out_pid, pa.int64()),
                "before": pa.array(out_before, pa.int64()),
                "after": pa.array(out_after, pa.int64()),
            }
        )

    pids = ray.data.from_arrow(
        pa.table({"pid": pa.array(sorted(done), pa.int64())})
    )
    stats = pids.map_batches(compact_one, batch_format="pyarrow").to_pandas()
    return {
        "compacted_partitions": int((stats["after"] < stats["before"]).sum()),
        "files_before": int(stats["before"].sum()),
        "files_after": int(stats["after"].sum()),
    }


def read_partitioned(output_dir: str) -> pa.Table:
    """All committed partitions back as one Arrow table (test-scale
    helper; at scale, ``ray.data.read_parquet(output_dir)`` streams it).

    Validates each partition's on-disk row count against its manifest
    entry — any residual write duplication (e.g. a retried task whose
    debris escaped the salt sweep) raises loudly instead of returning
    silently duplicated rows."""
    readers = {ext: read_fn for ext, _, read_fn in FORMATS.values()}
    parts = []
    for pid, entry in sorted(mf.completed_partitions(output_dir).items()):
        pdir = os.path.join(output_dir, "partition_id={}".format(pid))
        ptables = [
            readers[os.path.splitext(f)[1]](os.path.join(pdir, f))
            for f in sorted(os.listdir(pdir))
            if os.path.splitext(f)[1] in readers
        ]
        n = sum(t.num_rows for t in ptables)
        expected = entry.get("n_docs")
        if expected is not None and n != expected:
            raise ValueError(
                "partition {} holds {} rows on disk but its manifest "
                "committed {} — duplicated or missing write debris".format(
                    pid, n, expected
                )
            )
        parts.extend(ptables)
    return pa.concat_tables(parts) if parts else pa.table({})
