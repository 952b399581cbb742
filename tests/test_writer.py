"""Generic resumable partitioned writer (ocr_ray.pipelines.writer)."""

import os

import pyarrow as pa
import ray.data

from ocr_ray.pipelines import writer
from ocr_ray.state import manifest as mf


def _docs(n=200):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["t%d" % i for i in range(n)]),
            }
        )
    )


def test_write_read_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "o")
    r = writer.write_partitioned(_docs(), out, key="doc_id", n_partitions=8)
    assert r == {"written": 200, "skipped_partitions": 0}
    back = writer.read_partitioned(out)
    assert back.num_rows == 200
    assert sorted(back.column("doc_id").to_pylist()) == list(range(200))
    assert len(mf.completed_partitions(out, n_partitions=8)) == 8


def test_resume_skips_committed_and_recomputes_missing(ray_session, tmp_path):
    import shutil

    out = str(tmp_path / "o")
    writer.write_partitioned(_docs(), out, key="doc_id", n_partitions=8)
    # wipe 3 partitions (files + manifest entries)
    for pid in (1, 4, 6):
        shutil.rmtree(os.path.join(out, "partition_id=%d" % pid))
        mf.invalidate_partition(out, pid)
    r = writer.write_partitioned(_docs(), out, key="doc_id", n_partitions=8)
    assert r["skipped_partitions"] == 5
    # exactly the missing rows were rewritten
    expect_missing = sum(
        1 for i in range(200) if (i * 2654435761) % 8 in (1, 4, 6)
    )
    assert r["written"] == expect_missing
    back = writer.read_partitioned(out)
    assert sorted(back.column("doc_id").to_pylist()) == list(range(200))


def test_uncommitted_debris_cleaned(ray_session, tmp_path):
    out = str(tmp_path / "o")
    writer.write_partitioned(_docs(), out, key="doc_id", n_partitions=4)
    # simulate a run killed between write and commit: files exist, no entry
    mf.invalidate_partition(out, 2)
    r = writer.write_partitioned(_docs(), out, key="doc_id", n_partitions=4)
    assert r["skipped_partitions"] == 3
    back = writer.read_partitioned(out)
    assert back.num_rows == 200  # no duplicated rows from the debris


def test_string_key_partitioning(ray_session, tmp_path):
    out = str(tmp_path / "o")
    ds = ray.data.from_arrow(
        pa.table({"url": pa.array(["u%d" % i for i in range(50)])})
    )
    r = writer.write_partitioned(ds, out, key="url", n_partitions=4)
    assert r["written"] == 50
    assert writer.read_partitioned(out).num_rows == 50


def test_same_key_multiset_blocks_both_land(ray_session, tmp_path):
    """Two blocks writing the same partition with an IDENTICAL key multiset
    and row count but DIFFERENT payloads must land as two files (the file
    name now includes a full-content digest + task id, not just the key
    sum) — the pre-fix name collided and silently dropped one block."""
    out = str(tmp_path / "o")
    t1 = pa.table({"k": pa.array(["s1"] * 4), "v": pa.array(range(4), pa.int64())})
    t2 = pa.table({"k": pa.array(["s1"] * 4), "v": pa.array(range(4, 8), pa.int64())})
    ds = ray.data.from_arrow(t1).union(ray.data.from_arrow(t2))
    r = writer.write_partitioned(ds, out, key="k", n_partitions=4)
    assert r["written"] == 8
    back = writer.read_partitioned(out)
    assert back.num_rows == 8  # manifest count and actual rows agree
    assert sorted(back.column("v").to_pylist()) == list(range(8))


def test_byte_identical_blocks_from_one_task_both_land(ray_session, tmp_path):
    """Regression (ADVICE r4 follow-up): two byte-identical blocks written
    by the SAME task used to collide on (task_id, digest, rows) and
    silently overwrite — the per-task sequence number keeps both."""
    out = str(tmp_path / "o")
    tbl = pa.table(
        {
            "doc_id": pa.array([7] * 50, pa.int64()),
            "text": pa.array(["same"] * 50),
        }
    )
    # two byte-identical input blocks; whatever the task placement, the
    # committed row count must equal what lands on disk
    ds = ray.data.from_arrow([tbl, tbl])
    r = writer.write_partitioned(ds, out, key="doc_id", n_partitions=4)
    assert r["written"] == 100
    back = writer.read_partitioned(out)
    assert back.num_rows == 100  # was 50 on the overwrite bug when colocated


def test_task_salt_seq_distinguishes_same_task_writes():
    writer._TASK_SEQ.clear()
    s1, a = writer._task_salt_seq("t1")
    s1b, b = writer._task_salt_seq("t1")
    s2, c = writer._task_salt_seq("t2")
    assert (a, b, c) == (0, 1, 0)
    assert s1 == s1b  # stable within one task execution
    assert s1 != s2


def test_read_partitioned_raises_on_duplicated_debris(ray_session, tmp_path):
    out = str(tmp_path / "o")
    writer.write_partitioned(_docs(40), out, key="doc_id", n_partitions=4)
    # simulate a retried task's escaped debris: duplicate one data file
    # under a foreign salt so the sweep would have missed it
    import shutil

    pdir = os.path.join(out, "partition_id=0")
    f = [x for x in os.listdir(pdir) if x.endswith(".parquet")][0]
    parts = f.split("-")
    parts[2] = "deadbeef"  # foreign attempt salt
    shutil.copy(os.path.join(pdir, f), os.path.join(pdir, "-".join(parts)))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="debris"):
        writer.read_partitioned(out)


def test_compaction_merges_small_files_preserving_rows(ray_session, tmp_path):
    out = str(tmp_path / "o")
    # many input blocks -> many (task, partition) files per partition
    ds = _docs(400).repartition(16)
    writer.write_partitioned(ds, out, key="doc_id", n_partitions=4)
    before = writer.read_partitioned(out)
    n_files_before = sum(
        len([f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")])
        for d in os.listdir(out)
        if d.startswith("partition_id=")
    )
    assert n_files_before > 4  # the small-files problem exists

    r = writer.compact_partitioned(out, target_bytes=1 << 30)
    assert r["compacted_partitions"] == 4
    assert r["files_before"] == n_files_before
    assert r["files_after"] == 4  # one right-sized file per partition

    # rows + content + manifests all unchanged (read validates counts)
    after = writer.read_partitioned(out)
    assert sorted(after.column("doc_id").to_pylist()) == sorted(
        before.column("doc_id").to_pylist()
    )
    assert len(mf.completed_partitions(out, n_partitions=4)) == 4

    # idempotent: a second pass finds nothing to do
    r2 = writer.compact_partitioned(out, target_bytes=1 << 30)
    assert r2["compacted_partitions"] == 0
    assert r2["files_after"] == 4


def test_compaction_sweeps_crashed_temp_dirs(ray_session, tmp_path):
    import pyarrow.parquet as pq

    out = str(tmp_path / "o")
    writer.write_partitioned(_docs(100), out, key="doc_id", n_partitions=4)
    # simulate a compaction that died between build and swap
    junk = os.path.join(out, ".compact-2.tmp")
    os.makedirs(junk)
    pq.write_table(pa.table({"doc_id": pa.array([999])}), junk + "/x.parquet")
    old = os.path.join(out, ".old-1.tmp")
    os.makedirs(old)

    writer.compact_partitioned(out, target_bytes=1 << 30)
    assert not os.path.exists(junk) and not os.path.exists(old)
    back = writer.read_partitioned(out)
    assert back.num_rows == 100  # the junk row never leaks into reads


def test_jsonl_and_csv_sink_roundtrip_with_resume(ray_session, tmp_path):
    """Interchange sinks keep every writer guarantee: round-trip content,
    manifest row counts, and resume skipping — only the body serializer
    changes."""
    import shutil

    for fmt, ext in (("jsonl", ".jsonl"), ("csv", ".csv")):
        out = str(tmp_path / fmt)
        r = writer.write_partitioned(
            _docs(), out, key="doc_id", n_partitions=4, format=fmt
        )
        assert r == {"written": 200, "skipped_partitions": 0}
        files = [
            f
            for pid in range(4)
            for f in os.listdir(os.path.join(out, "partition_id=%d" % pid))
        ]
        assert files and all(f.endswith(ext) for f in files)
        back = writer.read_partitioned(out)
        assert sorted(back.column("doc_id").to_pylist()) == list(range(200))
        assert sorted(back.column("text").to_pylist()) == sorted(
            "t%d" % i for i in range(200)
        )
        # resume: wipe one partition, rerun writes only it
        shutil.rmtree(os.path.join(out, "partition_id=2"))
        mf.invalidate_partition(out, 2)
        r2 = writer.write_partitioned(
            _docs(), out, key="doc_id", n_partitions=4, format=fmt
        )
        assert r2["skipped_partitions"] == 3
        assert writer.read_partitioned(out).num_rows == 200
