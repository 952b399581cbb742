"""Common-Crawl-curation operators: paragraph-level corpus dedup, per-source
document caps, exact distributed quantiles.

These are the remaining wide-shape curation ops a 100-TB web-corpus pipeline
needs beyond document-level dedup (CCNet dedups at PARAGRAPH granularity
before anything else; domain caps bound any single site's contribution;
length quantiles drive the quality-filter thresholds).  Each is built to the
repo's scale rules: partial aggregation before every shuffle, size-planned
joins, bucketed reassembly (one Python call per bucket, never per key), and
a driver that only ever holds provably-small state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min, Sum

from ..sources.io import read_table
from ..stages.joins import _add_key_bucket, auto_join

# paragraph contract shared with the SQL oracle: non-overlapping 10-word
# windows of the space-split text (the testdata corpus has no newlines, so
# CCNet's newline-paragraphs degenerate; fixed word windows keep the
# granularity sub-document and the contract SQL-expressible)
PAR_WORDS = 10
# rank = doc_id * _RANK_BASE + paragraph index; the corpus keeps the
# FIRST occurrence (smallest rank) of every distinct paragraph
_RANK_BASE = 1_000_000


def _explode_paragraphs(batch: pa.Table) -> pa.Table:
    ids, pidx, pars, ranks = [], [], [], []
    for did, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        words = (text or "").split(" ")
        for i in range(0, len(words), PAR_WORDS):
            par = " ".join(words[i : i + PAR_WORDS])
            if not par:
                continue
            ids.append(did)
            pidx.append(i // PAR_WORDS)
            pars.append(par)
            ranks.append(did * _RANK_BASE + i // PAR_WORDS)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "pidx": pa.array(pidx, pa.int64()),
            "par": pa.array(pars, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
        }
    )


def paragraph_dedup(docs: ray.data.Dataset, *, n_buckets: int = 64) -> ray.data.Dataset:
    """Corpus-wide paragraph dedup, the CCNet shape: explode -> winner per
    distinct paragraph (groupby + native Min aggregate, vectorized combine)
    -> size-planned join back -> keep first occurrences -> bucketed
    per-document reassembly.

    Scale shape: two shuffles (winner aggregate, reassembly) plus one join
    whose sides are both corpus-proportional — auto_join broadcasts the
    winner table only when provably small, else hash-partitions.  At 100 TB
    you would key the join by a 128-bit content hash instead of the
    paragraph text to shrink shuffle payloads; the string key here keeps
    the oracle comparison exact.

    Documents whose every paragraph lost (all first seen elsewhere) drop
    out of the result — the contract the SQL oracle mirrors.
    """
    import pyarrow.compute as pc

    pars = docs.map_batches(_explode_paragraphs, batch_format="pyarrow")
    winners = pars.groupby("par").aggregate(Min("rank", alias_name="mr"))

    def keep_winners(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("rank"), batch.column("mr")))

    kept = auto_join(pars, winners, on="par").map_batches(
        keep_winners, batch_format="pyarrow"
    )

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        return _add_key_bucket(
            df[["doc_id", "pidx", "par"]], key="doc_id", n_buckets=n_buckets
        )

    def assemble(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(["doc_id", "pidx"])
        out = (
            df.groupby("doc_id", sort=True)["par"]
            .agg([("text_dedup", " ".join), ("n_kept", "size")])
            .reset_index()
        )
        out["n_kept"] = out["n_kept"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        kept.map_batches(bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(assemble, batch_format="pyarrow")
        .select_columns(["doc_id", "text_dedup", "n_kept"])
    )


def q_paragraph_dedup(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return paragraph_dedup(docs)


SQL_PARAGRAPH_DEDUP = (
    "WITH pars AS ("
    "  SELECT doc_id, CAST(s['i'] AS BIGINT) AS pidx,"
    "         array_to_string((string_split(text, ' '))"
    "[CAST(s['i'] AS BIGINT) * 10 + 1 : CAST(s['i'] AS BIGINT) * 10 + 10], ' ') AS par"
    "  FROM (SELECT doc_id, text, unnest(list_transform("
    "range(CAST(ceil(len(string_split(text, ' ')) / 10.0) AS BIGINT)),"
    " i -> struct_pack(i := i))) AS s FROM documents)"
    "), ranked AS ("
    "  SELECT doc_id, pidx, par, doc_id * 1000000 + pidx AS rank"
    "  FROM pars WHERE par <> ''"
    "), winners AS ("
    "  SELECT par, min(rank) AS mr FROM ranked GROUP BY par"
    ") SELECT r.doc_id, string_agg(r.par, ' ' ORDER BY r.pidx) AS text_dedup,"
    " count(*) AS n_kept"
    " FROM ranked r JOIN winners w ON r.par = w.par AND r.rank = w.mr"
    " GROUP BY r.doc_id"
)


def q_source_cap(sf_dir: str):
    """Per-source (per-domain) document cap: keep the first ``k`` docs per
    source by doc_id — the standard web-corpus guard against one domain
    dominating the training mix.  Per-batch partial top-k per source (<= k
    rows per (batch, source) survive the shuffle), then a tiny grouped
    resolve over partials — a hot domain never lands as one whole task
    (the stratified_sample shape)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    k = 10

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["source", "doc_id"]).groupby("source", sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def resolve(group: pa.Table) -> pa.Table:
        return group.sort_by([("doc_id", "ascending")]).slice(0, k)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(resolve, batch_format="pyarrow")
        .select_columns(["doc_id", "source"])
    )


SQL_SOURCE_CAP = (
    "SELECT doc_id, source FROM ("
    "SELECT doc_id, source, row_number() OVER "
    "(PARTITION BY source ORDER BY doc_id) AS rn FROM documents"
    ") WHERE rn <= 10"
)


def q_dedup_canonical(sf_dir: str):
    """Canonical-document selection per duplicate cluster — the retention
    step a curation pipeline runs AFTER near-dup clustering: keep the
    longest member (n_chars, ties -> smallest doc_id) of every MinHash
    cluster.  The argmax is ONE native Max aggregate over a packed
    (n_chars, ~doc_id) key plus a Count in the same groupby — no
    map_groups, no per-cluster Python, one shuffle after the join."""
    from ray.data.aggregate import Count, Max

    from ..stages import dedup

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.8)
    clusters = dedup.connected_components(pairs.select_columns(["a", "b"]))
    lens = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    joined = auto_join(clusters, lens, on="doc_id")

    B = np.int64(1) << np.int64(32)

    def pack(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
        packed = nc.astype(np.int64) * B + (B - np.int64(1) - ids.astype(np.int64))
        return pa.table(
            {
                "cluster_id": batch.column("cluster_id"),
                "packed": pa.array(packed, pa.int64()),
            }
        )

    agg = (
        joined.map_batches(pack, batch_format="pyarrow")
        .groupby("cluster_id")
        .aggregate(Max("packed", alias_name="mx"), Count(alias_name="n_members"))
    )

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mx = batch.column("mx").to_numpy(zero_copy_only=False).astype(np.int64)
        canonical = (B - np.int64(1)) - (mx % B)
        return pa.table(
            {
                "cluster_id": batch.column("cluster_id"),
                "canonical": pa.array(canonical, pa.int64()),
                "n_members": pc.cast(batch.column("n_members"), pa.int64()),
            }
        )

    return agg.map_batches(decode, batch_format="pyarrow")


from .queries_ext import SQL_CLUSTER_GRAPH_CTE  # noqa: E402

SQL_DEDUP_CANONICAL = (
    # same recursive-CTE cluster graph as dedup_clusters, then a window
    # argmax per cluster
    SQL_CLUSTER_GRAPH_CTE
    + ", clusters AS (SELECT node AS doc_id, min(r) AS cluster_id "
    "FROM reach GROUP BY node), "
    "j AS (SELECT c.cluster_id, c.doc_id, d.n_chars FROM clusters c "
    "JOIN documents d USING (doc_id)), "
    "ranked AS (SELECT cluster_id, doc_id, "
    "row_number() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rn, "
    "count(*) OVER (PARTITION BY cluster_id) AS n_members FROM j) "
    "SELECT cluster_id, doc_id AS canonical, n_members FROM ranked WHERE rn = 1"
)


QUANTILES = (0.5, 0.9, 0.99)


def q_len_quantiles(sf_dir: str):
    """EXACT distributed quantiles of document length per language via the
    value-histogram trick: per-batch (lang, n_chars) counts, one groupby-sum
    shuffle, then a driver-side cumulative walk over DISTINCT (lang, length)
    pairs only — bounded by (#langs x #distinct lengths), independent of
    corpus row count, so the driver never sees data-proportional state.
    The quantile contract (shared with the oracle): the smallest value
    whose cumulative count reaches ceil(q * total)."""
    ds = read_table(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby(["lang", "n_chars"]).size().rename("cnt")
        return pa.Table.from_pandas(df.reset_index(), preserve_index=False)

    hist = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # small by construction: distinct (lang, length) pairs
    )
    rows = []
    for lang, g in hist.sort_values(["lang", "n_chars"]).groupby("lang", sort=True):
        cum = g["cnt"].cumsum().to_numpy()
        vals = g["n_chars"].to_numpy()
        total = int(cum[-1])
        for q in QUANTILES:
            need = int(np.ceil(q * total))
            rows.append(
                {"lang": lang, "q": q, "value": int(vals[np.searchsorted(cum, need)])}
            )
    return pd.DataFrame(rows)


SQL_LEN_QUANTILES = (
    "WITH c AS (SELECT lang, n_chars, count(*) AS cnt FROM documents"
    " GROUP BY lang, n_chars),"
    " w AS (SELECT lang, n_chars,"
    " sum(cnt) OVER (PARTITION BY lang ORDER BY n_chars) AS cum,"
    " sum(cnt) OVER (PARTITION BY lang) AS total FROM c) "
    + " UNION ALL ".join(
        "SELECT lang, {q} AS q, min(n_chars) AS value FROM w"
        " WHERE cum >= ceil({q} * total) GROUP BY lang".format(q=q)
        for q in QUANTILES
    )
)


CC_QUERIES = {
    "paragraph_dedup": q_paragraph_dedup,
    "source_cap": q_source_cap,
    "len_quantiles": q_len_quantiles,
    "dedup_canonical": q_dedup_canonical,
}

CC_ORACLE_SQL = {
    "paragraph_dedup": SQL_PARAGRAPH_DEDUP,
    "source_cap": SQL_SOURCE_CAP,
    "len_quantiles": SQL_LEN_QUANTILES,
    "dedup_canonical": SQL_DEDUP_CANONICAL,
}
