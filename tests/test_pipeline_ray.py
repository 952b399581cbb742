"""Ray pipeline equivalence + resume tests (FIXTURES.md §5 invariants).

Invariant 2 (parallelism-invariance) is the analog of the reference's
graph-vs-eager conformance tests (tests/__init__.py:105-162): the same job
at different parallelism must produce identical bytes.
"""

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray import reference, synth
from ocr_ray.pipelines import extraction as ex
from ocr_ray.state import manifest as mf

N_PAGES = 72


@pytest.fixture(scope="module")
def corpus():
    return synth.synth_corpus(N_PAGES)


@pytest.fixture(scope="module")
def oracle(corpus):
    return reference.extract_table(corpus).sort_by("url")


def _collect(ray, ds, schema) -> pa.Table:
    tables = [ray.get(r) for r in ds.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows]
    return pa.concat_tables(t.select(schema.names).cast(schema) for t in tables).sort_by("url")


def test_fused_matches_oracle(ray_session, corpus, oracle):
    import ray.data

    ds = ex.extract_pages(ray.data.from_arrow(corpus).repartition(6), mode="fused")
    assert _collect(ray_session, ds, oracle.schema).equals(oracle)


def test_exploded_matches_oracle(ray_session, corpus, oracle):
    import ray.data

    ds = ex.extract_pages(ray.data.from_arrow(corpus).repartition(6), mode="exploded")
    assert _collect(ray_session, ds, oracle.schema).equals(oracle)


def test_parallelism_invariance(ray_session, corpus, oracle):
    import ray.data

    for nblocks in (1, 13):
        ds = ex.extract_pages(
            ray.data.from_arrow(corpus).repartition(nblocks), mode="fused", batch_size=7
        )
        assert _collect(ray_session, ds, oracle.schema).equals(oracle)


def test_run_and_resume(ray_session, corpus, oracle, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("extract_out"))
    shutil.rmtree(out, ignore_errors=True)
    stats = ex.run_extraction(corpus, out, n_partitions=6)
    assert stats["extracted"] == N_PAGES
    back = ex.read_extracted(out).select(oracle.column_names).cast(oracle.schema)
    assert back.sort_by("url").equals(oracle)

    # full resume: nothing recomputed
    stats2 = ex.run_extraction(corpus, out, n_partitions=6)
    assert stats2 == {"extracted": 0, "skipped_partitions": 6}


def test_kill_and_resume(ray_session, corpus, oracle, tmp_path_factory):
    """Simulate a crash after some partitions committed: drop half the
    manifests + their output dirs, resume, and require byte-identical final
    output with no partition extracted twice (FIXTURES.md invariant 3)."""
    import os

    out = str(tmp_path_factory.mktemp("extract_resume"))
    ex.run_extraction(corpus, out, n_partitions=6)
    # wipe partitions 0-2 (simulating a run killed before committing them)
    for pid in (0, 1, 2):
        shutil.rmtree(os.path.join(out, "partition_id={}".format(pid)), ignore_errors=True)
        os.remove(os.path.join(mf.manifest_dir(out), "part-{:06d}.json".format(pid)))
    stats = ex.run_extraction(corpus, out, n_partitions=6)
    assert stats["skipped_partitions"] == 3
    back = ex.read_extracted(out).select(oracle.column_names).cast(oracle.schema)
    assert back.sort_by("url").equals(oracle)
    # each committed partition has exactly one manifest entry
    assert len(mf.completed_partitions(out)) == 6
    # no duplicate urls across partition dirs
    urls = pq.read_table(out, columns=["url"]).column("url").to_pylist()
    assert len(urls) == len(set(urls)) == N_PAGES


def test_resume_invalidates_changed_input(ray_session, corpus, oracle, tmp_path_factory):
    """ADVICE r1: a committed partition whose INPUT rows changed between
    runs must be recomputed, not silently skipped (input_digest check)."""
    import ray as _ray

    out = str(tmp_path_factory.mktemp("extract_changed"))
    ex.run_extraction(corpus, out, n_partitions=6)

    # perturb one page's url -> its old partition loses a row (digest
    # mismatch) and some partition gains one
    urls = corpus.column("url").to_pylist()
    old_pid = mf.url_partition(urls[0], 6)
    urls[0] = urls[0] + "-changed"
    changed = corpus.set_column(
        corpus.schema.get_field_index("url"), "url", pa.array(urls)
    )
    stats = ex.run_extraction(changed, out, n_partitions=6)
    new_pid = mf.url_partition(urls[0], 6)
    stale = {old_pid, new_pid}
    assert stats["skipped_partitions"] == 6 - len(stale)
    assert stats["extracted"] > 0
    back_urls = pq.read_table(out, columns=["url"]).column("url").to_pylist()
    assert sorted(back_urls) == sorted(urls)  # new corpus, no dropped rows


def test_combine_digests_duplicate_sensitive():
    """sum-mod-2^64 combine: a digest repeated an even number of times must
    NOT cancel out (the xor failure mode from round-1 ADVICE)."""
    d = "ab" * 32
    assert mf.combine_digests([d, d]) != mf.combine_digests([])
    assert mf.combine_digests([d, d, d, d]) != mf.combine_digests([d, d])


def test_documents_identity_roundtrip(ray_session):
    """pages synthesized from the documents table extract back to exactly
    the text column (the DuckDB-oracle identity)."""
    import ray.data

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    pages = synth.pages_from_documents(docs)
    ds = ex.extract_pages(ray.data.from_arrow(pages).repartition(4), mode="fused")
    got = _collect(ray_session, ds, reference.extract_table(pages.slice(0, 1)).schema)
    by_url = dict(zip(got.column("url").to_pylist(), got.column("extracted").to_pylist()))
    for url, text in zip(pages.column("url").to_pylist(), pages.column("text").to_pylist()):
        assert by_url[url] == text
    assert all(s == "ok" for s in got.column("status").to_pylist())


def test_crash_between_write_and_commit(ray_session, corpus, oracle, tmp_path_factory):
    """A run killed AFTER a partition's parquet landed but BEFORE its
    manifest committed must not duplicate that partition's rows on resume:
    the uncommitted dir is debris and gets recomputed from scratch."""
    import os

    out = str(tmp_path_factory.mktemp("extract_uncommitted"))
    ex.run_extraction(corpus, out, n_partitions=6)
    # simulate: manifest for partition 0 lost, output dir still present
    os.remove(os.path.join(mf.manifest_dir(out), "part-000000.json"))
    stats = ex.run_extraction(corpus, out, n_partitions=6)
    assert stats["skipped_partitions"] == 5
    urls = pq.read_table(out, columns=["url"]).column("url").to_pylist()
    assert len(urls) == len(set(urls)) == N_PAGES  # no duplicates
    back = ex.read_extracted(out).select(oracle.column_names).cast(oracle.schema)
    assert back.sort_by("url").equals(oracle)


def test_compact_partitions(ray_session, corpus, oracle, tmp_path_factory):
    """Output maintenance: many small per-task files merge to one per
    partition with byte-identical content, digest-verified against the
    manifest; resume afterwards still skips everything."""
    import os

    out = str(tmp_path_factory.mktemp("extract_compact"))
    # multi-file source -> multiple writer tasks -> multiple files per
    # partition (one in-memory table would land in a single block)
    src = str(tmp_path_factory.mktemp("extract_compact_src"))
    step = corpus.num_rows // 6
    for i in range(6):
        pq.write_table(
            corpus.slice(i * step, step if i < 5 else corpus.num_rows - 5 * step),
            "{}/part-{}.parquet".format(src, i),
        )
    ex.run_extraction(src, out, n_partitions=4, batch_size=8)
    n_before = sum(
        len([f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")])
        for d in os.listdir(out) if d.startswith("partition_id=")
    )
    stats = ex.compact_partitions(out)
    assert stats["compacted"] >= 1
    for d in os.listdir(out):
        if d.startswith("partition_id="):
            files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
            assert len(files) == 1
    assert n_before > 4
    back = ex.read_extracted(out).select(oracle.column_names).cast(oracle.schema)
    assert back.sort_by("url").equals(oracle)
    # manifests untouched: full resume skips all partitions
    stats2 = ex.run_extraction(src, out, n_partitions=4)
    assert stats2 == {"extracted": 0, "skipped_partitions": 4}


def test_compact_aborts_on_corruption(ray_session, corpus, tmp_path_factory):
    """A partition whose content no longer matches its committed digest is
    left untouched (compaction must never launder corruption)."""
    import os

    import pyarrow.parquet as pq_mod

    out = str(tmp_path_factory.mktemp("extract_compact_bad"))
    src = str(tmp_path_factory.mktemp("extract_compact_bad_src"))
    step = corpus.num_rows // 6
    for i in range(6):
        pq.write_table(
            corpus.slice(i * step, step if i < 5 else corpus.num_rows - 5 * step),
            "{}/part-{}.parquet".format(src, i),
        )
    ex.run_extraction(src, out, n_partitions=2, batch_size=8)
    # corrupt partition 0: drop one row file
    pdir = os.path.join(out, "partition_id=0")
    victim = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))[0]
    os.remove(os.path.join(pdir, victim))
    n_files = {
        d: len(os.listdir(os.path.join(out, d)))
        for d in os.listdir(out) if d.startswith("partition_id=")
    }
    stats = ex.compact_partitions(out)
    assert stats["skipped"] >= 1
    # corrupted partition untouched (same file count)
    assert len(os.listdir(pdir)) == n_files["partition_id=0"]
