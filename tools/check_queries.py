"""Local mimic of the driver's correctness gate: run each queries() entry
and its oracle_sql() on the same sf dir, compare row count + schema +
order-insensitive value hash.  Usage:

    python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        df.astype(str).itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode("utf-8", "replace"))
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs, sqls = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            "CREATE VIEW {} AS SELECT * FROM read_parquet('{}')".format(
                t, os.path.join(sf_dir, t + ".parquet")
            )
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ray_df = to_pandas(fn(sf_dir))
        if name not in sqls:
            print("{:24s} rows={} (rows-only, no oracle)".format(name, len(ray_df)))
            continue
        ora_df = con.execute(sqls[name]).df()
        problems = []
        if len(ray_df) != len(ora_df):
            problems.append("rows {} != {}".format(len(ray_df), len(ora_df)))
        if sorted(ray_df.columns) != sorted(ora_df.columns):
            problems.append(
                "cols {} != {}".format(sorted(ray_df.columns), sorted(ora_df.columns))
            )
        else:
            h1, h2 = value_hash(ray_df), value_hash(ora_df)
            if h1 != h2:
                problems.append("hash {} != {}".format(h1, h2))
                merged = ray_df[sorted(ray_df.columns)].astype(str)
                o = ora_df[sorted(ora_df.columns)].astype(str)
                a = set(map(tuple, merged.itertuples(index=False, name=None)))
                b = set(map(tuple, o.itertuples(index=False, name=None)))
                for row in list(a - b)[:3]:
                    print("   ray-only:", row)
                for row in list(b - a)[:3]:
                    print("   ora-only:", row)
        status = "OK " if not problems else "FAIL"
        print("{} {:24s} rows={} {}".format(status, name, len(ray_df), "; ".join(problems)))
        if problems:
            failures.append(name)
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
