"""Resume-at-scale measurement (BASELINE.md 'Resume at scale').

Full run -> wipe k of n partitions (simulated crash) -> resume; reports
both wall times, the recomputed row count, and verifies no duplicates.
Usage: python tools/resume_bench.py [n_partitions] [n_wiped]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_partitions = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_wiped = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR", log_to_driver=False)
    import logging

    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import bench
    from ocr_ray.pipelines.extraction import run_extraction
    from ocr_ray.state import manifest as mf

    pages = bench.ensure_bench_pages(os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    out = "/tmp/ocr_ray_bench/resume_out"
    shutil.rmtree(out, ignore_errors=True)

    t0 = time.perf_counter()
    stats_full = run_extraction(pages, out, n_partitions=n_partitions)
    t_full = time.perf_counter() - t0

    for pid in range(n_wiped):
        shutil.rmtree(os.path.join(out, "partition_id={}".format(pid)), ignore_errors=True)
        mf.invalidate_partition(out, pid)

    t0 = time.perf_counter()
    stats_resume = run_extraction(pages, out, n_partitions=n_partitions)
    t_resume = time.perf_counter() - t0

    import pyarrow.parquet as pq

    urls = pq.read_table(out, columns=["url"]).column("url").to_pylist()
    assert len(urls) == len(set(urls)) == stats_full["extracted"], "duplicate rows!"
    assert stats_resume["skipped_partitions"] == n_partitions - n_wiped
    print(json.dumps({
        "rows": stats_full["extracted"],
        "n_partitions": n_partitions,
        "n_wiped": n_wiped,
        "sec_full": round(t_full, 1),
        "sec_resume": round(t_resume, 1),
        "recomputed_rows": stats_resume["extracted"],
        "speedup": round(t_full / t_resume, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
