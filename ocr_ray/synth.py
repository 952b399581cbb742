"""Deterministic synthetic `pages` generator (the FIXTURES.md corpus).

Two generators, both pure functions of their arguments (fixed seeds, no wall
clock, no network):

- :func:`pages_from_documents` wraps each row of the driver-generated
  ``documents`` table into a chrome-laden HTML page whose correct extraction
  is exactly the original ``text`` column — the identity round-trip used by
  the DuckDB oracle (`oracle_sql`), ``entry()`` and the benchmark.
- :func:`synth_corpus` emits the archetype corpus of FIXTURES.md §2 (plain /
  chrome / linklist / sections / table / list / fragments / dupspans /
  pdf_basic / pdf_footnote / empty / garbage) for golden-file pytest
  coverage, mirroring the curated-fixture strategy of the reference tests
  (/root/reference/tests/test_utils_boxes.py:380-567).

url embeds a host id with Zipf-ish host skew so url-hash repartitioning has
something to fix (SURVEY §4 skew row).
"""

from __future__ import annotations

import random

import pyarrow as pa

from . import minipdf
from .schema import PAGES

EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds

_WORDS = (
    "the data stream merge sort table scan filter join order key value row "
    "column batch window group hash spark vector query small big fast slow "
    "part line customer agg dup"
).split()

CHROME_HEADER = "SiteName MegaPortal"
CHROME_NAV = ["Home", "Products", "About", "Contact"]
CHROME_FOOTER = "Copyright 2020 SiteName. All rights reserved."
CHROME_ASIDE = "Subscribe to our newsletter for weekly updates!"

_LANGS = ("en", "en", "en", "fr", "de", "es", "zh")


def _rng(seed: int, i: int) -> random.Random:
    return random.Random((seed << 32) ^ (i * 2654435761 % (1 << 32)))


def _host(i: int, n_hosts: int = 50) -> int:
    # Zipf-ish skew: host 0 owns ~25% of pages, long tail for the rest
    r = (i * 48271) % 100
    if r < 25:
        return 0
    if r < 40:
        return 1
    return 2 + (i * 69621) % (n_hosts - 2)


def page_url(i: int, kind: str = "p") -> str:
    return "https://host-{:03d}.example/{}/{:08d}".format(_host(i), kind, i)



#: DuckDB fragment reconstructing :func:`page_url`(doc_id) (see _host) —
#: shared by every oracle that must name synthesized urls in SQL.
URL_SQL = (
    "'https://host-' || lpad(CAST(CASE WHEN (doc_id*48271)%100 < 25 THEN 0 "
    "WHEN (doc_id*48271)%100 < 40 THEN 1 "
    "ELSE 2 + (doc_id*69621)%48 END AS VARCHAR), 3, '0') "
    "|| '.example/p/' || lpad(CAST(doc_id AS VARCHAR), 8, '0')"
)

def _chrome_wrap(body_html: str, title: str) -> str:
    """Boilerplate that prepare_tree must strip entirely."""
    nav = "".join("<li><a href=\"/{0}\">{0}</a></li>".format(x) for x in CHROME_NAV)
    return (
        "<html><head><title>{title}</title>"
        "<script>var t = track('all');</script>"
        "<style>.x {{ color: red }}</style></head>"
        "<body><header><h1>{hdr}</h1></header>"
        "<nav><ul>{nav}</ul></nav>"
        "<aside><p>{aside}</p></aside>"
        "<div id=\"main\">{body}</div>"
        "<form action=\"/q\"><input name=\"q\"/></form>"
        "<footer><p>{footer}</p></footer></body></html>"
    ).format(title=title, hdr=CHROME_HEADER, nav=nav, aside=CHROME_ASIDE,
             body=body_html, footer=CHROME_FOOTER)


# ---------------------------------------------------------------------------
# documents-table wrapping (identity oracle)
# ---------------------------------------------------------------------------

def wrap_document_html(doc_id: int, text: str) -> str:
    """One <p> per document: extraction must return exactly ``text``."""
    return _chrome_wrap("<p>{}</p>".format(text), "doc {}".format(doc_id))


#: link_page_html cross-link rule: doc d links to (7d + 13j + 1) % LINK_MOD
#: for j in 0..LINK_FANOUT-1 (closed-form, so a SQL oracle can mirror it).
LINK_MOD = 1000
LINK_FANOUT = 3


def link_page_html(doc_id: int) -> str:
    """Chrome-wrapped page whose body carries deterministic cross-links —
    the fixture for link-graph extraction (q_link_graph).  Separate from
    wrap_document_html so the byte-identity extraction contract and the
    benchmark workload stay untouched."""
    rel = "".join(
        '<li><a href="/page/{0}">related {0}</a></li>'.format(
            (7 * doc_id + 13 * j + 1) % LINK_MOD
        )
        for j in range(LINK_FANOUT)
    )
    body = (
        "<p>doc body {d}</p><ul>{rel}</ul>"
        '<p>see <a href="https://example.org/ext">elsewhere</a></p>'
    ).format(d=doc_id, rel=rel)
    return _chrome_wrap(body, "links {}".format(doc_id))


#: table_page_html cell rule: row k of doc d carries val (31d + 7k) % 100
TABLE_ROWS = 4


def table_page_html(doc_id: int) -> str:
    """Chrome-wrapped page whose body is a data table with deterministic
    cells — the fixture for STRUCTURED table extraction (q_table_rows).
    The third column is constant on purpose: the extractor's
    constant-column drop (reference html_parser.py:182-207) must remove it,
    and the oracle asserts it stays gone."""
    rows = "".join(
        "<tr><td>row{0}</td><td>{1}</td><td>const</td></tr>".format(
            k, (31 * doc_id + 7 * k) % 100
        )
        for k in range(TABLE_ROWS)
    )
    body = (
        "<table><thead><tr><th>name</th><th>val</th><th>fixed</th></tr></thead>"
        "<tbody>{}</tbody></table>".format(rows)
        + "<p>table page {} trailer</p>".format(doc_id)
    )
    return _chrome_wrap(body, "table {}".format(doc_id))


def wrap_documents_batch(batch: pa.Table, *, offset: int = 0) -> pa.Table:
    """One documents batch -> pages batch (PAGES schema), keyed by doc_id.

    url/warc_ts are pure functions of ``offset + doc_id``, so the mapping is
    batch-composition-independent (usable inside ``map_batches``) and the
    DuckDB oracle can reconstruct the url in SQL.
    """
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    urls, ts, htmls = [], [], []
    for d, text in zip(doc_ids, texts):
        i = offset + d
        urls.append(page_url(i))
        ts.append(EPOCH_US + i * 1_000_000)
        htmls.append(wrap_document_html(i, text).encode("utf-8"))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES,
    )


def pages_from_documents(documents: pa.Table, *, repeat: int = 1) -> pa.Table:
    """documents(doc_id, text, lang, ...) -> pages table (PAGES schema).

    ``repeat`` > 1 tiles the corpus with distinct urls to scale the
    benchmark input without changing per-document work (doc_ids are assumed
    contiguous 0..n-1, as in the driver testdata).
    """
    n = documents.num_rows
    parts = [wrap_documents_batch(documents, offset=r * n) for r in range(repeat)]
    return pa.concat_tables(parts)


# ---------------------------------------------------------------------------
# archetype corpus (FIXTURES.md §2)
# ---------------------------------------------------------------------------

ARCHETYPES = (
    "plain", "chrome", "linklist", "sections", "table", "list",
    "fragments", "dupspans", "pdf_basic", "pdf_footnote", "empty", "garbage",
    "md_doc", "txt_doc", "py_code", "java_code", "docx_doc",
)

# standalone-document archetypes dispatch by url extension
# (extract_core.payload_kind; reference parsers/__init__.py:173-177)
DOC_ARCH_EXT = {
    "md_doc": "md",
    "txt_doc": "txt",
    "py_code": "py",
    "java_code": "java",
    "docx_doc": "docx",
}


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _paragraphs_html(rng: random.Random, n_paras: int) -> str:
    return "".join(
        "<p>{}</p>".format(_sentence(rng, rng.randint(8, 30))) for _ in range(n_paras)
    )


def _make_html(arch: str, rng: random.Random, i: int, scale: int = 1) -> bytes:
    title = "{} page {}".format(arch, i)
    if arch == "plain":
        body = _paragraphs_html(rng, scale * rng.randint(2, 5))
        return "<html><head><title>{}</title></head><body>{}</body></html>".format(
            title, body
        ).encode()
    if arch == "chrome":
        return _chrome_wrap(_paragraphs_html(rng, scale * rng.randint(2, 5)), title).encode()
    if arch == "linklist":
        body = (
            "<ul>"
            + "".join('<li><a href="/x{0}">link {0}</a></li>'.format(k) for k in range(5))
            + "</ul>"
            + "<p>See the <a href=\"https://ray.io/docs\">docs</a> and the "
            + "<a href=\"https://arrow.apache.org\">arrow site</a> for more. "
            + _sentence(rng, 10) + "</p>"
            + "<p>Also check the <a href=\"https://ray.io/docs\">docs</a> again.</p>"
        )
        return _chrome_wrap(body, title).encode()
    if arch == "sections":
        body = (
            "<h1>Alpha</h1>" + _paragraphs_html(rng, scale)
            + "<h2>Beta</h2>" + _paragraphs_html(rng, 2 * scale)
            + "<h3>Gamma</h3>" + _paragraphs_html(rng, scale)
            + "<h2>Delta</h2>" + _paragraphs_html(rng, scale)
        )
        return _chrome_wrap(body, title).encode()
    if arch == "table":
        rows = "".join(
            "<tr><td>row{0}</td><td>{1}</td><td>const</td></tr>".format(
                k, rng.randint(0, 99)
            )
            for k in range(4 * scale)
        )
        body = (
            "<table><thead><tr><th>name</th><th>val</th><th>fixed</th></tr></thead>"
            "<tbody>{}</tbody></table>".format(rows)
            + _paragraphs_html(rng, 1)
        )
        return _chrome_wrap(body, title).encode()
    if arch == "list":
        body = (
            "<ul><li>first item</li><li></li><li>second item</li></ul>"
            "<ol><li>{}</li><li>{}</li></ol>".format(
                _sentence(rng, 4), _sentence(rng, 5)
            )
        )
        return _chrome_wrap(body, title).encode()
    if arch == "fragments":
        # body text scattered over many adjacent small nodes that the
        # div/span-transparent tree walk must reassemble into paragraphs
        words = [_sentence(rng, 2) for _ in range(8 * scale)]
        frag = "<p>" + "".join("<span>{} </span>".format(w) for w in words) + "</p>"
        return _chrome_wrap(frag + _paragraphs_html(rng, 1), title).encode()
    if arch == "dupspans":
        s = _sentence(rng, 12)
        near = s.rsplit(" ", 1)[0] + " altered"
        body = "<p>{0}</p><p>{0}</p><p>{1}</p><p>{2}</p>".format(
            s, near, _sentence(rng, 9)
        )
        return _chrome_wrap(body, title).encode()
    if arch == "empty":
        return b""
    if arch == "garbage":
        if (i // len(ARCHETYPES)) % 2 == 0:
            return b"%PDF-1.4\n1 0 obj\n<< truncated"
        return bytes([0xFF, 0xFE, 0x00, 0x9C]) * 8
    raise ValueError(arch)


def _make_doc(arch: str, rng: random.Random, i: int, scale: int = 1) -> bytes:
    """Standalone-document payloads (md/txt/py/java/docx archetypes)."""
    from . import doc_parsers

    if arch == "md_doc":
        parts = [
            "# Guide {}".format(i),
            "",
            _sentence(rng, 12),
            "",
            "## Usage",
            "",
            _sentence(rng, scale * 10),
            "",
            "```python",
            "x = {}".format(rng.randint(0, 99)),
            "print(x)",
            "```",
            "",
            "![diagram.png](assets/diagram-{}.png)".format(i),
            "",
            "### Notes",
            "",
            "See [the docs](https://docs.example/{}) then {}".format(
                i, _sentence(rng, 6)
            ),
        ]
        return "\n".join(parts).encode()
    if arch == "txt_doc":
        paras = [_sentence(rng, rng.randint(6, 20)) for _ in range(scale * rng.randint(2, 4))]
        return "\n\n".join(paras).encode()
    if arch == "py_code":
        return (
            "# module m{i}\nimport os\n\n"
            "def f_{i}(x):\n    return x + {k}\n\n"
            "class C{i}:\n    value = {k}\n\n"
            "@decorator\ndef g_{i}():\n    pass\n"
        ).format(i=i, k=rng.randint(0, 99)).encode()
    if arch == "java_code":
        return (
            "public class C{i} {{\n    static int value = {k};\n"
            "    public int get() {{ return value; }}\n}}\n"
        ).format(i=i, k=rng.randint(0, 99)).encode()
    if arch == "docx_doc":
        return doc_parsers.build_docx(
            ["Heading {}".format(i)]
            + [_sentence(rng, rng.randint(6, 15)) for _ in range(scale * 2)]
            + [""]  # empty <w:p> that normalize() must drop
        )
    raise ValueError(arch)


def _make_pdf(arch: str, rng: random.Random, i: int, scale: int = 1) -> bytes:
    body_size = 12.0
    leading = body_size * 1.2
    pages = []
    n_pages = rng.randint(1, 3) if arch == "pdf_basic" else 2
    for page in range(n_pages):
        ops = []
        y = 720.0
        if arch == "pdf_footnote":
            ops.append(minipdf.text_op(200, 760, 9.0, "Running Header {}".format(i)))
        n_paras = scale * rng.randint(2, 3)
        fn_counter = 0
        for _ in range(n_paras):
            n_lines = rng.randint(1, 3)
            for ln in range(n_lines):
                x = 72.0
                n_words = rng.randint(3, 7)
                for w in range(n_words):
                    word = rng.choice(_WORDS)
                    ops.append(minipdf.text_op(x, y, body_size, word))
                    x += (len(word) + 1) * body_size * 0.5
                if (
                    arch == "pdf_footnote"
                    and ln == 0
                    and fn_counter == 0
                    and page == 0
                ):
                    fn_counter += 1
                    ops.append(minipdf.text_op(x, y + 3.0, 8.0, str(fn_counter)))
                y -= leading
            y -= leading  # paragraph gap = one blank leading
        if arch == "pdf_footnote":
            if page == 0:
                ops.append(minipdf.text_op(72, 100, 8.0, "^1 source note for page one"))
            ops.append(minipdf.text_op(300, 40, 9.0, str(page + 1)))
        pages.append(ops)
    return minipdf.build_pdf(pages)


def synth_corpus(n: int = 120, seed: int = 7) -> pa.Table:
    """n pages cycling through the archetypes, PAGES schema."""
    urls, ts, htmls, raw, langs = [], [], [], [], []
    for i in range(n):
        arch = ARCHETYPES[i % len(ARCHETYPES)]
        rng = _rng(seed, i)
        if arch.startswith("pdf"):
            payload = _make_pdf(arch, rng, i)
        elif arch in DOC_ARCH_EXT:
            payload = _make_doc(arch, rng, i)
        else:
            payload = _make_html(arch, rng, i)
        url = page_url(i, arch)
        if arch in DOC_ARCH_EXT:
            url += "." + DOC_ARCH_EXT[arch]
        urls.append(url)
        ts.append(EPOCH_US + i * 1_000_000)
        htmls.append(payload)
        raw.append("")
        langs.append(_LANGS[i % len(_LANGS)])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(raw, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES,
    )
