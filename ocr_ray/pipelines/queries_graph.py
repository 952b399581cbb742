"""Iterative graph computation: integer-exact PageRank over a synthesized
link graph.

The one algorithm class the rest of the registry doesn't cover: a
FIXED-ITERATION-COUNT algorithm whose every round is a full shuffle (edge
join + inflow aggregate).  The web-curation motivation is direct — link-
graph centrality is the classic page-quality prior (the original use of
the web graph these Common-Crawl-style pages come from).

Exactness contract (what makes the DuckDB oracle bitwise): all rank mass
is INTEGER micro-units, so the per-round aggregation is order-independent
(float PageRank would hash-mismatch on summation order):

    R0(v)        = 10^12
    share(e)     = (R(src) * 85 // 100) // outdeg(src)   per edge
    R'(v)        = 10^12 * 15 // 100  +  sum of incoming shares

(integer-division dust and dangling-node mass simply vanish — both sides
implement the same contract).  The edge multiset is a pure function of
the documents table: doc d emits src = d % N, dst = (d * 7 + 3) % N,
skipping self-loops, N = 97 — so the oracle rebuilds it in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ..sources.io import read_table
from ..stages.joins import auto_join

N_NODES = 97
N_ITERS = 5
_R0 = 10**12
_BASE = _R0 * 15 // 100


def _edges(sf_dir: str) -> ray.data.Dataset:
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def emit(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        src = d % N_NODES
        dst = (d * 7 + 3) % N_NODES
        keep = src != dst
        return pa.table(
            {
                "src": pa.array(src[keep], pa.int64()),
                "dst": pa.array(dst[keep], pa.int64()),
            }
        )

    return ds.map_batches(emit, batch_format="pyarrow")


def q_pagerank(sf_dir: str):
    """5 exact PageRank rounds over the synthesized doc link graph, with
    the rank table DATASET-RESIDENT throughout (no driver structure
    proportional to #nodes).

    Scale shape per round: ranks join edges_deg on src via the
    size-planned ``auto_join`` (ranks broadcasts while #nodes rows stay
    under the limit, hash-partitions past it), one groupby(dst) Sum for
    the inflow, one left-outer join against the static node table to
    fold the base mass back in.  Each round's rank Dataset is
    ``materialize()``d — the per-iteration barrier every iterative
    algorithm needs (and what makes ``auto_join``'s size probe free
    instead of a lineage re-execution)."""
    import pyarrow.compute as pc

    edges = _edges(sf_dir)
    deg = edges.groupby("src").aggregate(Count(alias_name="outdeg"))
    edges_deg = auto_join(edges, deg, on="src").materialize()

    nodes = ray.data.range(N_NODES).map_batches(
        lambda b: pa.table({"node": pc.cast(b.column("id"), pa.int64())}),
        batch_format="pyarrow",
    ).materialize()
    ranks = nodes.map_batches(
        lambda b: b.append_column(
            "r", pa.array(np.full(b.num_rows, _R0, np.int64), pa.int64())
        ),
        batch_format="pyarrow",
    ).materialize()

    def shares(batch: pa.Table) -> pa.Table:
        rs = batch.column("r").to_numpy(zero_copy_only=False).astype(np.int64)
        deg_v = batch.column("outdeg").to_numpy(zero_copy_only=False)
        share = (rs * 85 // 100) // deg_v
        return pa.table(
            {"dst": batch.column("dst"), "share": pa.array(share, pa.int64())}
        )

    def fold_base(batch: pa.Table) -> pa.Table:
        inflow = pc.fill_null(pc.cast(batch.column("inflow"), pa.int64()), 0)
        return pa.table(
            {
                "node": batch.column("node"),
                "r": pc.add(inflow, pa.scalar(_BASE, pa.int64())),
            }
        )

    for _ in range(N_ITERS):
        inflow = (
            auto_join(edges_deg, ranks, on="src", right_on="node")
            .map_batches(shares, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("share", alias_name="inflow"))
            .materialize()  # <= #nodes rows; keeps auto_join's size probe
            # from re-executing the round's shuffle
        )
        ranks = (
            auto_join(nodes, inflow, on="node", right_on="dst", join_type="left_outer")
            .map_batches(fold_base, batch_format="pyarrow")
            .materialize()
        )

    return ranks.sort("node").map_batches(
        lambda b: pa.table(
            {"node": b.column("node"), "rank": b.column("r")}
        ),
        batch_format="pyarrow",
    )


def _sql_pagerank() -> str:
    # unrolled iterations: pr0 -> pr1 -> ... (recursive CTEs cannot
    # aggregate in the recursive term, so generate the chain)
    parts = [
        "WITH nodes AS (SELECT CAST(s['i'] AS BIGINT) AS node FROM "
        "(SELECT unnest(list_transform(range({n}), i -> struct_pack(i := i))) AS s)),"
        " edges AS (SELECT doc_id % {n} AS src, (doc_id * 7 + 3) % {n} AS dst"
        " FROM documents WHERE doc_id % {n} <> (doc_id * 7 + 3) % {n}),"
        " deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),"
        " pr0 AS (SELECT node, CAST({r0} AS BIGINT) AS r FROM nodes)".format(
            n=N_NODES, r0=_R0
        )
    ]
    for i in range(N_ITERS):
        parts.append(
            ", inflow{j} AS (SELECT e.dst, sum((p.r * 85 // 100) // d.outdeg) AS f"
            " FROM edges e JOIN deg d ON e.src = d.src"
            " JOIN pr{i} p ON p.node = e.src GROUP BY e.dst),"
            " pr{j} AS (SELECT n.node,"
            " CAST({base} + coalesce(i.f, 0) AS BIGINT) AS r"
            " FROM nodes n LEFT JOIN inflow{j} i ON i.dst = n.node)".format(
                i=i, j=i + 1, base=_BASE
            )
        )
    parts.append(
        " SELECT node, r AS rank FROM pr{} ORDER BY node".format(N_ITERS)
    )
    return "".join(parts)


SQL_PAGERANK = _sql_pagerank()

GRAPH_QUERIES = {"pagerank": q_pagerank}
GRAPH_ORACLE_SQL = {"pagerank": SQL_PAGERANK}
