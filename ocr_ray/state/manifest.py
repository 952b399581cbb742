"""Per-partition lineage manifests: the resume/dedup database.

The reference keeps a single shared ``map.json`` ``{filename -> infos}`` dict
for skip-if-done (models/ocr/base_ocr.py:142-144, utils/callbacks/
file_saver.py:145-192) and a keyed one-file-per-entry ``JSONDir`` store
(utils/databases/json_dir.py:18-138).  At 10^12 rows a url-level map cannot
live in RAM, so here the pattern is made **partition-granular**: one small
JSON file per completed url-hash partition, written atomically (tmp +
rename) after the partition's Parquet output lands, holding

    partition_id, n_docs, input_digest, output_digest, status

Resume = read the manifest dir (tiny: one file per partition), broadcast the
completed-id set, and anti-join the input inside ``map_batches``
(SURVEY §2.5 J1).  The manifest is append-only; a killed run leaves at worst
one partition unrecorded, which is simply recomputed (extraction is
deterministic, so recompute == the reference's re-parse-on-cache-miss).
"""

from __future__ import annotations

import json
import os
import zlib


def url_partition(url: str, n_partitions: int) -> int:
    """Deterministic url-hash partition id (crc32; NEVER Python's salted hash)."""
    return zlib.crc32(url.encode("utf-8")) % n_partitions


def manifest_dir(output_dir: str) -> str:
    return os.path.join(output_dir, "_manifest")


def completed_partitions(
    output_dir: str, *, n_partitions: int | None = None
) -> dict[int, dict]:
    """Read all committed partition entries. Missing dir -> empty.

    With ``n_partitions`` given, entries committed under a DIFFERENT
    partition count are ignored (the url->partition mapping changed, so
    they cannot be trusted for the skip anti-join).  Reads are pure;
    :func:`purge_mismatched` deletes untrusted entries explicitly."""
    mdir = manifest_dir(output_dir)
    if not os.path.isdir(mdir):
        return {}
    out: dict[int, dict] = {}
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        with open(os.path.join(mdir, name)) as f:
            entry = json.load(f)
        if entry.get("status") != "done":
            continue
        if n_partitions is not None and entry.get("n_partitions") != n_partitions:
            continue
        out[int(entry["partition_id"])] = entry
    return out


def purge_mismatched(output_dir: str, n_partitions: int) -> int:
    """Delete manifest entries committed under a different partition count.

    Called by run_extraction before a resume: a stale entry would poison a
    future resume that switches back to the old count after this run
    rewrites the data.  Returns the number purged."""
    mdir = manifest_dir(output_dir)
    if not os.path.isdir(mdir):
        return 0
    removed = 0
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        path = os.path.join(mdir, name)
        with open(path) as f:
            entry = json.load(f)
        if entry.get("n_partitions") != n_partitions:
            os.remove(path)
            removed += 1
    return removed


def commit_partition(
    output_dir: str,
    partition_id: int,
    *,
    n_docs: int,
    input_digest: str,
    output_digest: str,
    n_partitions: int | None = None,
) -> None:
    """Atomically record a finished partition (write tmp, rename)."""
    mdir = manifest_dir(output_dir)
    os.makedirs(mdir, exist_ok=True)
    entry = {
        "partition_id": int(partition_id),
        "n_partitions": n_partitions,
        "n_docs": int(n_docs),
        "input_digest": input_digest,
        "output_digest": output_digest,
        "status": "done",
    }
    final = os.path.join(mdir, "part-{:06d}.json".format(partition_id))
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, final)


def clear(output_dir: str) -> None:
    """Remove every manifest entry (used by resume=False full rewrites so
    stale entries from a different partitioning cannot linger)."""
    import shutil

    shutil.rmtree(manifest_dir(output_dir), ignore_errors=True)


def invalidate_partition(output_dir: str, partition_id: int) -> None:
    """Remove one committed entry (resume found its input digest stale)."""
    path = os.path.join(manifest_dir(output_dir), "part-{:06d}.json".format(partition_id))
    if os.path.exists(path):
        os.remove(path)


def combine_digests(hex_digests) -> str:
    """Order-insensitive AND duplicate-sensitive digest combine: sum of
    per-row sha256 64-bit prefixes mod 2^64.  (xor was rejected: a row
    duplicated an even number of times cancels out, so a corrupted
    partition could digest identically to a clean one.)"""
    acc = 0
    for d in hex_digests:
        if d:
            acc = (acc + int(d[:16], 16)) & 0xFFFFFFFFFFFFFFFF
    return "{:016x}".format(acc)
