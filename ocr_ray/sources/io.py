"""Input readers (the reference's parser/loader dispatch, SURVEY §2.1 S2/S11).

Always prune columns at the read: a pages read that ships the multi-MB
``html`` binary column into stages that don't parse it is wrong
(SURVEY §7.5 hard part 6).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data


def read_pages(source, *, columns=None, override_num_blocks=None) -> ray.data.Dataset:
    """pages Dataset from a parquet path/dir or an in-memory Arrow table."""
    if isinstance(source, pa.Table):
        ds = ray.data.from_arrow(source)
        if columns:
            ds = ds.select_columns(columns)
        if override_num_blocks:
            ds = ds.repartition(override_num_blocks)
        return ds
    return ray.data.read_parquet(
        source, columns=columns, override_num_blocks=override_num_blocks
    )


def read_table(sf_dir: str, name: str, *, columns=None) -> ray.data.Dataset:
    """One driver-generated testdata table (TESTDATA.md)."""
    return ray.data.read_parquet(
        os.path.join(sf_dir, name + ".parquet"), columns=columns
    )
