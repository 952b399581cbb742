"""Fast regex-driven HTML tokenizer building the same Node tree as
:mod:`ocr_ray.html_extract`'s stdlib-based builder.

``html.parser.HTMLParser`` is pure Python with per-character bookkeeping;
for boilerplate-strip workloads a single compiled-regex scan over the
document is ~3-5x faster and is what the hot path can afford at 100 TB
(the reference leans on lxml's C parser for the same reason,
html_parser.py:119-126).

Semantics are kept identical to the stdlib builder — same implicit-</p>
handling, void tags, stray-close tolerance, entity unescaping, script/style
raw-text skipping — and pinned by an equivalence test that asserts
byte-identical extraction over the full archetype corpus
(tests/test_fast_html.py).  ``html_extract.parse_html`` dispatches here by
default; set ``OCR_RAY_SLOW_HTML=1`` to force the stdlib path.
"""

from __future__ import annotations

import re
from html import unescape

# one token: comment | doctype/PI | close tag | open tag (quote-aware so a
# '>' inside a quoted attribute value doesn't end the tag)
_TOKEN_RE = re.compile(
    r"<!--.*?-->"
    r"|<!\[CDATA\[.*?\]\]>"
    r"|<![^>]*>"
    r"|<\?[^>]*>"
    r"|</\s*([a-zA-Z][a-zA-Z0-9]*)[^>]*>"
    r"|<([a-zA-Z][a-zA-Z0-9]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>",
    re.DOTALL,
)

_ATTR_RE = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]*))?"
)

_RAWTEXT_CLOSE = {
    "script": re.compile(r"</script[^>]*>", re.IGNORECASE),
    "style": re.compile(r"</style[^>]*>", re.IGNORECASE),
}


def _parse_attrs(raw: str) -> dict:
    attrs = {}
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        val = m.group(2)
        if val is None:
            attrs[name] = None
        else:
            if val[:1] in ("'", '"'):
                val = val[1:-1]
            attrs[name] = unescape(val)
    return attrs


def fast_parse(html: str, node_cls, void_tags, p_closers):
    """html string -> node_cls tree (same shape as the stdlib builder)."""
    root = node_cls("[document]")
    stack = [root]
    pos = 0
    n = len(html)
    while pos < n:
        m = _TOKEN_RE.search(html, pos)
        if m is None:
            if pos < n:
                stack[-1].children.append(unescape(html[pos:]))
            break
        if m.start() > pos:
            stack[-1].children.append(unescape(html[pos : m.start()]))
        pos = m.end()
        close_name, open_name, attr_raw = m.group(1), m.group(2), m.group(3)
        if close_name:
            tag = close_name.lower()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
            continue
        if not open_name:
            continue  # comment / doctype / PI
        tag = open_name.lower()
        self_closing = attr_raw.rstrip().endswith("/")
        if tag in p_closers:
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == "p":
                    del stack[i:]
                    break
        node = node_cls(tag, _parse_attrs(attr_raw) if attr_raw.strip(" /") else {})
        stack[-1].children.append(node)
        if tag in _RAWTEXT_CLOSE:
            # raw-text element: skip to the matching close, content becomes
            # a single text child (html.parser CDATA-mode equivalent)
            closer = _RAWTEXT_CLOSE[tag].search(html, pos)
            if closer is None:
                node.children.append(html[pos:])
                pos = n
            else:
                node.children.append(html[pos : closer.start()])
                pos = closer.end()
            continue
        if tag not in void_tags and not self_closing:
            stack.append(node)
    return root
