"""Relational query pipelines: hash join, as-of join, window, multimodal.

Merged into the main registry by :mod:`ocr_ray.pipelines.queries`.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from ..sources.io import read_table
from ..stages import joins

# ---------------------------------------------------------------------------
# both-sides-large hash join (Dataset.join, hash-partitioned)
# ---------------------------------------------------------------------------

def q_lineitem_order_join(sf_dir: str):
    """lineitem ⨝ orders on orderkey via the size-planned join (auto_join:
    orders broadcasts while provably small, hash-partitioned Dataset.join
    at scale), then revenue per order priority."""
    line = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return pa.table({"l_orderkey": batch.column("l_orderkey"), "revenue": rev})

    line = line.map_batches(revenue, batch_format="pyarrow")
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = joins.auto_join(line, orders, on="l_orderkey", right_on="o_orderkey")
    out = joined.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_items"), Sum("revenue", alias_name="revenue")
    )
    df = out.to_pandas()
    df["revenue"] = df["revenue"].round(2)
    return df


SQL_LINEITEM_ORDER_JOIN = (
    "SELECT o_orderpriority, count(*) AS n_items, "
    "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "GROUP BY o_orderpriority"
)


# ---------------------------------------------------------------------------
# as-of join (sort-merge within key groups)
# ---------------------------------------------------------------------------

def q_asof_last_event(sf_dir: str):
    """For each order: the ts of the customer's latest event at or before
    the order date (as-of backward join orders->events on custkey=user_id).
    Orders whose customer has no prior events (or no events at all) get
    NULL."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    events = read_table(sf_dir, "events", columns=["user_id", "ts"])
    out = joins.asof_join(
        orders,
        events,
        left_key="o_custkey",
        left_ts="o_orderdate",
        left_keep=["o_orderkey"],
        right_key="user_id",
        right_ts="ts",
        out_col="last_event_ts",
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return df[["o_orderkey", "last_event_ts"]]

    return out.map_batches(project, batch_format="pandas")


SQL_ASOF_LAST_EVENT = (
    "SELECT o_orderkey, (SELECT max(ts) FROM events e "
    "WHERE e.user_id = o.o_custkey AND e.ts <= o.o_orderdate) AS last_event_ts "
    "FROM orders o"
)


# ---------------------------------------------------------------------------
# per-key ordered window (running cumulative sum)
# ---------------------------------------------------------------------------

def q_running_total(sf_dir: str):
    """Per-user running total of event value ordered by (ts, event_id) —
    the groupby(key).map_groups window pattern."""
    events = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    out = joins.running_window(
        events, key="user_id", order_by=["ts", "event_id"], value="value",
        out_col="running_value",
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return df[["event_id", "running_value"]]

    return out.map_batches(project, batch_format="pandas")


SQL_RUNNING_TOTAL = (
    "SELECT event_id, round(sum(value) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value "
    "FROM events"
)


# ---------------------------------------------------------------------------
# multimodal feature extraction (stubbed codec, real plumbing)
# ---------------------------------------------------------------------------

def q_media_features(sf_dir: str):
    """Actor-pool feature extraction over a deterministic synthetic media
    table: the raw dialect payloads (image/audio/video) plus REAL codec
    payloads (PNG/BMP/WAV/baseline-JPEG 4:4:4 and 4:2:0, decoded by the
    from-scratch decoders in ocr_ray.codecs / ocr_ray.jpeg).  Rows-only
    check (binary payload semantics aren't SQL-expressible); pinned by
    tests/test_multimodal.py and tests/test_jpeg.py."""
    import pyarrow as _pa

    from ..stages import multimodal

    table = _pa.concat_tables(
        [multimodal.synth_media(48), multimodal.synth_media_real(20)]
    )
    media = ray.data.from_arrow(table)
    out = multimodal.media_features(media, concurrency=2, batch_size=16)
    return out.select_columns(["media_id", "kind", "n_bytes", "mean", "std", "status"])


REL_QUERIES = {
    "lineitem_order_join": q_lineitem_order_join,
    "asof_last_event": q_asof_last_event,
    "running_total": q_running_total,
    "media_features": q_media_features,
}

REL_ORACLE_SQL = {
    "lineitem_order_join": SQL_LINEITEM_ORDER_JOIN,
    "asof_last_event": SQL_ASOF_LAST_EVENT,
    "running_total": SQL_RUNNING_TOTAL,
}
