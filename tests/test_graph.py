"""Integer-exact PageRank (ocr_ray.pipelines.queries_graph)."""

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_ray.pipelines import queries_graph as qg


def test_pagerank_mass_and_ordering(ray_session, tmp_path):
    t = pa.table({"doc_id": pa.array(range(10), pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = qg.q_pagerank(str(tmp_path))
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
    a = qg.q_pagerank(str(tmp_path)).column("rank").to_pylist()
    b = qg.q_pagerank(str(tmp_path)).column("rank").to_pylist()
    assert a == b
