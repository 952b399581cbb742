"""Integer-exact PageRank (ocr_ray.pipelines.queries_graph).

Since r4 ``q_pagerank`` returns a ray Dataset (ranks stay Dataset-resident
between rounds — no driver structure proportional to #nodes); the tests
collect the small final table for assertions."""

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_ray.pipelines import queries_graph as qg


def _rank_table(sf_dir: str) -> pa.Table:
    out = qg.q_pagerank(sf_dir)
    return pa.concat_tables(out.to_arrow_refs_resolved()) if hasattr(
        out, "to_arrow_refs_resolved"
    ) else pa.Table.from_pandas(out.to_pandas())


def test_pagerank_mass_and_ordering(ray_session, tmp_path):
    t = pa.table({"doc_id": pa.array(range(10), pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = _rank_table(str(tmp_path))
    ranks = dict(zip(out.column("node").to_pylist(), out.column("rank").to_pylist()))
    assert len(ranks) == qg.N_NODES
    # doc 0 emits edge 0 -> 3: dst 3 collects inflow, node 50 is isolated
    assert ranks[3] > ranks[50]
    # an isolated node holds exactly the base mass after any iteration
    assert ranks[50] == qg._BASE
    # no node exceeds the total injected mass
    assert max(ranks.values()) <= qg.N_NODES * qg._R0


def test_pagerank_deterministic(ray_session, tmp_path):
    t = pa.table({"doc_id": pa.array(range(25), pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    a = _rank_table(str(tmp_path)).column("rank").to_pylist()
    b = _rank_table(str(tmp_path)).column("rank").to_pylist()
    assert a == b
