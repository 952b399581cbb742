"""Structural golden column tests (FIXTURES.md §3 `paragraphs`)."""

import pyarrow as pa

from ocr_ray import reference, synth
from ocr_ray.stages.extract import extract_batch


def test_ray_structural_matches_oracle(ray_session):
    import ray.data

    corpus = synth.synth_corpus(36)
    oracle = reference.extract_table(corpus, include_paragraphs=True).sort_by("url")
    ds = ray.data.from_arrow(corpus).repartition(4).map_batches(
        extract_batch,
        fn_kwargs={"include_paragraphs": True},
        batch_format="pyarrow",
        batch_size=7,
    )
    got = pa.concat_tables(
        [t for t in (ray_session.get(r) for r in ds.to_arrow_refs()) if t.num_rows]
    )
    got = got.select(oracle.column_names).cast(oracle.schema).sort_by("url")
    assert got.equals(oracle)


def test_sections_structure():
    corpus = synth.synth_corpus(36)
    full = reference.extract_table(corpus, include_paragraphs=True)
    rows = [r for r in full.to_pylist() if "/sections/" in r["url"]]
    assert rows
    for r in rows:
        sections = [tuple(p["section"]) for p in r["paragraphs"]]
        assert ("Alpha",) in sections
        assert ("Alpha", "Beta") in sections
        assert ("Alpha", "Beta", "Gamma") in sections
        assert ("Alpha", "Delta") in sections  # h2 pops Gamma from the stack


def test_pdf_order_weights_in_structure():
    """FIXTURES invariant 5: headers before body before footnotes before
    page numbers within each page."""
    corpus = synth.synth_corpus(36)
    full = reference.extract_table(corpus, include_paragraphs=True)
    rows = [r for r in full.to_pylist() if "/pdf_footnote/" in r["url"]]
    assert rows
    rank = {"header": 0, "body": 1, "footnote": 2, "page_number": 3}
    for r in rows:
        per_page: dict[int, list[int]] = {}
        kinds_seen = set()
        for p in r["paragraphs"]:
            k = (
                "header" if p["is_header"]
                else "page_number" if p["is_page_number"]
                else "footnote" if p["is_footnote"]
                else "body"
            )
            kinds_seen.add(k)
            per_page.setdefault(p["page"], []).append(rank[k])
        assert {"header", "body", "page_number"} <= kinds_seen
        for page, ranks in per_page.items():
            assert ranks == sorted(ranks), (r["url"], page, ranks)


def test_structural_error_rows_have_empty_paragraphs():
    t = reference.extract_table(
        synth.synth_corpus(12), include_paragraphs=True
    )
    for r in t.to_pylist():
        if r["status"] == "error":
            assert r["paragraphs"] == []


def test_list_column_matrix():
    import numpy as np
    import pyarrow as pa
    import pytest

    from ocr_ray.schema import list_column_matrix

    col = pa.chunked_array([pa.array([[1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float32()))])
    m = list_column_matrix(col)
    assert m.dtype == np.float64 and m.shape == (2, 2)
    assert m.tolist() == [[1.0, 2.0], [3.0, 4.0]]
    assert list_column_matrix(pa.array([], pa.list_(pa.float64()))).shape == (0, 0)
    # ragged lists with a compatible TOTAL size must still raise
    with pytest.raises(ValueError, match="ragged"):
        list_column_matrix(pa.array([[1.0], [2.0, 3.0, 4.0]], pa.list_(pa.float64())))


#: approximate-by-design queries pinned by pytest accuracy gates instead
#: of a DuckDB oracle (README "rows-only" list) — additions to the
#: registry MUST either ship an oracle_sql() entry or be added here with
#: an accuracy gate, or this drift gate fails.
ROWS_ONLY_BY_DESIGN = {
    "knn_ivf",
    "knn_ivf_indexed",
    "distinct_tokens_hll",
    "distinct_tokens_by_lang",
    "value_quantiles_kll",
}


def test_registry_oracle_coverage():
    from ocr_ray.pipelines.queries import ORACLE_SQL, QUERIES

    missing = set(QUERIES) - set(ORACLE_SQL) - ROWS_ONLY_BY_DESIGN
    assert not missing, "queries with neither oracle nor rows-only waiver: %s" % sorted(missing)
    orphans = set(ORACLE_SQL) - set(QUERIES)
    assert not orphans, "oracles without a query: %s" % sorted(orphans)
    stale = ROWS_ONLY_BY_DESIGN & set(ORACLE_SQL)
    assert not stale, "rows-only entries that now HAVE oracles: %s" % sorted(stale)
    assert ROWS_ONLY_BY_DESIGN <= set(QUERIES)
