"""The flagship extraction pipeline.

    read_parquet(pages, columns=[url, html, lang])
      -> map_batches(add url-hash partition_id)            # vectorized
      -> [resume] anti-join vs completed manifest           # broadcast set
      -> map_batches(PageExtractor, actor pool)             # detect+extract
      -> write_parquet(out, partition_cols=[partition_id])  # resumable layout
      -> commit per-partition manifests

Design notes for 100 TB (SURVEY §4):

- the ``html`` binary column is read once, parsed once, and never crosses a
  shuffle; the only wide op in the exploded variant is ``groupby('url')``
  over *post-extraction* text rows (small relative to the input payloads).
- ``partition_id = crc32(url) % P`` breaks host-level clustering (hot hosts
  arrive contiguously in crawl order); P is the resume granule, sized so a
  partition ≈ a few GB at production scale.
- the extractor is an actor pool: parser setup per actor, not per batch;
  ``batch_size`` is small because page payloads are wide (memory-aware).
- error rows flow through as ``status='error'`` instead of poisoning a
  batch; retries therefore never see a half-written partition (writes land
  under ``partition_id=...`` dirs; the manifest commit is the atomic gate).
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..sources.io import read_pages
from ..stages.extract import (
    BlockExtractor,
    PageExtractor,
    assemble_bucket,
    extract_batch,
)
from ..state import manifest as mf

PAGE_COLUMNS = ["url", "html", "lang"]


def default_concurrency() -> int:
    """Fixed actor-pool size: total CPUs minus ~12% headroom.

    A pool that reserves every CPU starves the read/write task stages and
    the pipeline serializes (measured: concurrency == num_cpus is ~10x
    slower end-to-end than num_cpus - 4 on a 32-CPU node).  A fixed pool
    also avoids autoscaling spin-up lag on short jobs.
    """
    try:
        import ray

        n = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        n = 4
    return max(2, n - max(1, n // 8))


def add_partition_id(batch: pa.Table, *, n_partitions: int) -> pa.Table:
    urls = batch.column("url").to_pylist()
    pids = np.fromiter(
        (zlib.crc32(u.encode("utf-8")) % n_partitions for u in urls),
        dtype=np.int64,
        count=len(urls),
    )
    return batch.append_column("partition_id", pa.array(pids, pa.int64()))


def extract_pages(
    ds: ray.data.Dataset,
    *,
    mode: str = "fused",
    footnote_mode: str = "keep",
    batch_size: int = 64,
    concurrency=None,
    actors: bool = False,
) -> ray.data.Dataset:
    """pages Dataset -> EXTRACTED Dataset (no sink).

    ``mode='fused'``: one row in, one row out, zero shuffles; stateless
    tasks by default (``actors=True`` switches to a PageExtractor pool —
    use when the extractor grows real per-actor state).
    ``mode='exploded'``: block rows + groupby(url) reassembly — the north
    rule's document-reassembly shuffle, byte-identical to fused.
    """
    if mode == "fused":
        if not actors:
            return ds.map_batches(
                extract_batch,
                fn_kwargs={"footnote_mode": footnote_mode},
                batch_format="pyarrow",
                batch_size=batch_size,
            )
        return ds.map_batches(
            PageExtractor,
            fn_constructor_kwargs={"footnote_mode": footnote_mode},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency or default_concurrency(),
        )
    if concurrency is None:
        concurrency = default_concurrency()
    if mode == "exploded":
        blocks = ds.map_batches(
            BlockExtractor,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
        # bucket the reassembly shuffle by url-hash: one map_groups call per
        # bucket instead of per url (per-group Python overhead dominates the
        # shuffle otherwise); bucket count ~ 8x CPUs bounds group size
        try:
            import ray as _ray

            n_buckets = 8 * max(4, int(_ray.cluster_resources().get("CPU", 4)))
        except Exception:
            n_buckets = 64

        def add_bucket(batch: pa.Table) -> pa.Table:
            urls = batch.column("url").to_pylist()
            b = np.fromiter(
                (zlib.crc32(u.encode("utf-8")) % n_buckets for u in urls),
                dtype=np.int64,
                count=len(urls),
            )
            return batch.append_column("url_bucket", pa.array(b, pa.int64()))

        return (
            blocks.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("url_bucket")
            .map_groups(
                assemble_bucket,
                batch_format="pyarrow",
                fn_kwargs={"footnote_mode": footnote_mode},
            )
        )
    raise ValueError(mode)


def run_extraction(
    source,
    output_dir: str,
    *,
    n_partitions: int = 32,
    mode: str = "fused",
    footnote_mode: str = "keep",
    batch_size: int = 64,
    concurrency=None,
    resume: bool = True,
) -> dict:
    """Resumable end-to-end run: pages -> partitioned Parquet + manifests.

    Returns run stats ``{'extracted': n, 'skipped_partitions': k}``.
    """
    ds = read_pages(source, columns=PAGE_COLUMNS)
    ds = ds.map_batches(
        add_partition_id,
        fn_kwargs={"n_partitions": n_partitions},
        batch_format="pyarrow",
    )

    if resume:
        mf.purge_mismatched(output_dir, n_partitions)
        done: dict[int, dict] = mf.completed_partitions(
            output_dir, n_partitions=n_partitions
        )
        if done:
            # A committed partition is only skippable if its INPUT is still
            # the rows it was computed from: recompute each partition's
            # url-sum digest (pruned url-column pass, cheap relative to the
            # extraction it saves) and invalidate any mismatch — otherwise a
            # changed corpus silently drops rows on resume.
            actual = _input_partition_digests(source, n_partitions)
            for pid in [
                p for p, e in done.items()
                if actual.get(p) != e.get("input_digest")
            ]:
                mf.invalidate_partition(output_dir, pid)
                del done[pid]
    else:
        done = {}
        mf.clear(output_dir)  # full rewrite: stale manifests must not linger
    # the manifest commit is the atomic gate: a partition dir WITHOUT a
    # committed manifest is debris from a killed run — remove it, or the
    # recompute would APPEND duplicate rows next to the orphaned files
    _clean_uncommitted_partitions(output_dir, committed=frozenset(done))
    if done:
        done_ids = frozenset(done)

        def _skip_done(batch: pa.Table) -> pa.Table:
            mask = [pid not in done_ids for pid in batch.column("partition_id").to_pylist()]
            return batch.filter(pa.array(mask, pa.bool_()))

        ds = ds.map_batches(_skip_done, batch_format="pyarrow")

    out = extract_pages(
        ds,
        mode=mode,
        footnote_mode=footnote_mode,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    # extractor stages rebuild the schema, so re-derive partition_id from url
    # (cheap, deterministic) for the partitioned write.
    out = out.map_batches(
        add_partition_id, fn_kwargs={"n_partitions": n_partitions}, batch_format="pyarrow"
    )
    # Write + stats in ONE pipeline pass: each task writes its rows into
    # partition_id=... dirs and emits a tiny (pid, n_docs, url_sum,
    # digest_sum) partial; a groupby over those partials yields one row per
    # partition.  Nothing but <= n_partitions stat rows ever reaches the
    # driver (the round-1 commit serially read every partition's url+digest
    # columns back through one process).
    stats_rows = (
        out.map_batches(
            _write_partition_files,
            fn_kwargs={"output_dir": output_dir},
            batch_format="pyarrow",
            batch_size=None,
        )
        .groupby("partition_id")
        .map_groups(_combine_stats, batch_format="pyarrow")
        .take_all()
    )
    n_rows = 0
    for r in stats_rows:
        pid = int(r["partition_id"])
        mf.commit_partition(
            output_dir,
            pid,
            n_docs=int(r["n_docs"]),
            input_digest="{:016x}".format(int(r["url_sum"]) & _U64),
            output_digest="{:016x}".format(int(r["digest_sum"]) & _U64),
            n_partitions=n_partitions,
        )
        n_rows += int(r["n_docs"])
    return {"extracted": n_rows, "skipped_partitions": len(done)}


def _clean_uncommitted_partitions(output_dir: str, *, committed=frozenset()) -> int:
    """Delete partition dirs that have no committed manifest entry (debris
    from a run killed between write and commit). Returns count removed."""
    import shutil

    if not os.path.isdir(output_dir):
        return 0
    removed = 0
    for name in os.listdir(output_dir):
        if not name.startswith("partition_id="):
            continue
        pid = int(name.split("=", 1)[1])
        if pid not in committed:
            shutil.rmtree(os.path.join(output_dir, name), ignore_errors=True)
            removed += 1
    return removed


_U64 = (1 << 64) - 1


def _url_sum(urls) -> int:
    """Order-insensitive, duplicate-sensitive url digest: sum of crc32s
    mod 2^64 (same combine rule as manifest.combine_digests)."""
    acc = 0
    for u in urls:
        acc = (acc + zlib.crc32(u.encode("utf-8"))) & _U64
    return acc


def _write_partition_files(batch: pa.Table, *, output_dir: str) -> pa.Table:
    """Write one parquet file per (task block, partition) under
    partition_id=... dirs and return per-partition stat partials.

    File names derive from the batch's url-sum + row count, so a retried
    task overwrites its own file instead of appending duplicates."""
    import pyarrow.compute as pc

    out_pid, out_n, out_url, out_dig = [], [], [], []
    if batch.num_rows:
        pid_arr = batch.column("partition_id")
        for pid in sorted(set(pid_arr.to_pylist())):
            sub = batch.filter(pc.equal(pid_arr, pa.scalar(pid)))
            url_acc = _url_sum(sub.column("url").to_pylist())
            dig_acc = 0
            for d in sub.column("digest").to_pylist():
                if d:
                    dig_acc = (dig_acc + int(d[:16], 16)) & _U64
            pdir = os.path.join(output_dir, "partition_id={}".format(pid))
            os.makedirs(pdir, exist_ok=True)
            fname = "part-{:016x}-{}.parquet".format(url_acc, sub.num_rows)
            pq.write_table(sub.drop_columns(["partition_id"]), os.path.join(pdir, fname))
            out_pid.append(pid)
            out_n.append(sub.num_rows)
            out_url.append(url_acc)
            out_dig.append(dig_acc)
    return pa.table(
        {
            "partition_id": pa.array(out_pid, pa.int64()),
            "n_docs": pa.array(out_n, pa.int64()),
            "url_sum": pa.array(out_url, pa.uint64()),
            "digest_sum": pa.array(out_dig, pa.uint64()),
        }
    )


def _combine_stats(g: pa.Table) -> pa.Table:
    return pa.table(
        {
            "partition_id": g.column("partition_id").slice(0, 1),
            "n_docs": pa.array([sum(g.column("n_docs").to_pylist())], pa.int64()),
            "url_sum": pa.array(
                [sum(g.column("url_sum").to_pylist()) & _U64], pa.uint64()
            ),
            "digest_sum": pa.array(
                [sum(g.column("digest_sum").to_pylist()) & _U64], pa.uint64()
            ),
        }
    )


def _input_partition_digests(source, n_partitions: int) -> dict[int, str]:
    """Per-partition url-sum digests of the CURRENT input (url column only,
    pruned at the read) — the resume validation side of the manifest."""
    ds = read_pages(source, columns=["url"]).map_batches(
        add_partition_id, fn_kwargs={"n_partitions": n_partitions},
        batch_format="pyarrow",
    )

    def partial(batch: pa.Table) -> pa.Table:
        pids, sums = [], []
        if batch.num_rows:
            pid_arr = batch.column("partition_id")
            urls = batch.column("url").to_pylist()
            acc: dict[int, int] = {}
            for pid, u in zip(pid_arr.to_pylist(), urls):
                acc[pid] = (acc.get(pid, 0) + zlib.crc32(u.encode("utf-8"))) & _U64
            pids = sorted(acc)
            sums = [acc[p] for p in pids]
        return pa.table(
            {
                "partition_id": pa.array(pids, pa.int64()),
                "url_sum": pa.array(sums, pa.uint64()),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "partition_id": g.column("partition_id").slice(0, 1),
                "url_sum": pa.array(
                    [sum(g.column("url_sum").to_pylist()) & _U64], pa.uint64()
                ),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("partition_id")
        .map_groups(combine, batch_format="pyarrow")
        .take_all()
    )
    return {
        int(r["partition_id"]): "{:016x}".format(int(r["url_sum"]) & _U64)
        for r in rows
    }


def compact_partitions(output_dir: str, *, max_files_per_partition: int = 1) -> dict:
    """Output maintenance: merge each committed partition's many small
    files (the writer emits one per task x partition) into
    ``max_files_per_partition``.  Safe under the manifest contract: the
    new file is written alongside, the partition's combined digest is
    recomputed and REQUIRED to match the committed ``output_digest``
    before the old files are removed — a mismatch aborts that partition
    untouched.  Returns ``{'compacted': n, 'skipped': k}``."""
    done = mf.completed_partitions(output_dir)
    compacted = skipped = 0
    for pid, entry in sorted(done.items()):
        pdir = os.path.join(output_dir, "partition_id={}".format(pid))
        if not os.path.isdir(pdir):
            skipped += 1
            continue
        files = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
        if len(files) <= max_files_per_partition:
            skipped += 1
            continue
        tbl = pq.read_table(pdir)
        digest = mf.combine_digests(tbl.column("digest").to_pylist())
        if digest != entry.get("output_digest"):
            skipped += 1  # integrity mismatch: leave the partition alone
            continue
        tmp = os.path.join(pdir, "compact-{:016x}.parquet.tmp".format(
            int(digest[:16], 16)))
        pq.write_table(tbl, tmp)
        final = tmp[: -len(".tmp")]
        os.replace(tmp, final)
        for f in files:
            if f != os.path.basename(final):
                os.remove(os.path.join(pdir, f))
        compacted += 1
    return {"compacted": compacted, "skipped": skipped}


def read_extracted(output_dir: str) -> pa.Table:
    """Driver-side read-back of a finished run, sorted by url (test helper)."""
    tbl = pq.read_table(output_dir)
    return tbl.sort_by("url")
