"""Standalone document parser tests (md/txt/py/java/docx branches,
reference utils/text/parsers/{md,txt,docx,py,java}_parser.py)."""

from ocr_ray import doc_parsers as dp
from ocr_ray.extract_core import extract_page, payload_kind


def test_url_extension():
    assert dp.url_extension("https://h.example/a/b.md") == "md"
    assert dp.url_extension("https://h.example/a/b.MD?q=1#frag") == "md"
    assert dp.url_extension("https://h.example/a/b") == ""
    assert dp.url_extension("https://h.example/a.b/c") == ""


def test_payload_kind_dispatch():
    assert payload_kind("https://x/y.md", b"# t") == "md"
    assert payload_kind("https://x/y.txt", b"t") == "txt"
    assert payload_kind("https://x/y.py", b"x=1") == "py"
    assert payload_kind("https://x/y.java", b"class C {}") == "java"
    assert payload_kind("https://x/y.docx", b"PK") == "docx"
    assert payload_kind("https://x/y.html", b"<p>t</p>") == "html"
    assert payload_kind("https://x/y", b"<p>t</p>") == "html"
    # pdf magic wins over extension
    assert payload_kind("https://x/y.md", b"%PDF-1.4") == "pdf"


def test_parse_txt_split_and_normalize():
    paras = dp.parse_txt("first para\n\n  second para  \n\n\n\nthird")
    assert [p["text"] for p in paras] == ["first para", "second para", "third"]
    assert all(p["type"] == "text" for p in paras)
    assert [p["order"] for p in paras] == [0, 1, 2]


def test_parse_python_blocks():
    src = "# header comment\nimport os\n\ndef f(x):\n    return x\n\nclass C:\n    pass\n\n@deco\ndef g():\n    pass\n"
    paras = dp.parse_python(src)
    assert all(p["type"] == "code" and p["language"] == "python" for p in paras)
    texts = [p["text"] for p in paras]
    assert len(texts) == 4  # header+import | def f | class C | @deco def g
    assert texts[1].startswith("def f")
    assert texts[2].startswith("class C")
    assert texts[3].startswith("@deco")


def test_parse_java_single_block():
    paras = dp.parse_java("class C { }\n")
    assert len(paras) == 1
    assert paras[0]["type"] == "code" and paras[0]["language"] == "java"


def test_parse_markdown_sections_fences_media():
    md = "\n".join(
        [
            "# Top",
            "",
            "intro text",
            "",
            "## Sub",
            "",
            "body line one",
            "body line two",
            "",
            "```sql",
            "SELECT 1;",
            "```",
            "",
            "![pic.png](a/pic.png)",
            "![unknown](a/file.xyz)",
            "",
            "tail with [a link](https://x) kept literal",
        ]
    )
    paras = dp.parse_markdown(md)
    by_text = {p["text"]: p for p in paras if "text" in p}
    # heading line itself stays in its paragraph text (md_parser.py:55-62)
    assert "# Top" in by_text
    assert by_text["intro text"]["section"] == ["Top"]
    # section stack replaced at the heading's depth
    assert by_text["body line one\nbody line two"]["section"] == ["Top", "Sub"]
    code = [p for p in paras if p["type"] == "code"]
    assert len(code) == 1 and code[0]["language"] == "sql" and code[0]["text"] == "SELECT 1;"
    media = [p for p in paras if p["type"] == "image"]
    assert len(media) == 1 and media[0]["media"] == "pic.png"
    # unknown media extension skipped (reference branch crashes; documented divergence)
    assert "tail with [a link](https://x) kept literal" in by_text


def test_docx_roundtrip():
    payload = dp.build_docx(["Title", "body one", "", "body & two <ok>"])
    paras = dp.parse_docx(payload)
    assert [p["text"] for p in paras] == ["Title", "body one", "body & two <ok>"]


def test_extract_page_md_end_to_end():
    row = extract_page("https://h/x.md", b"# T\n\nhello world\n")
    assert row["status"] == "ok" and row["kind"] == "md"
    assert row["extracted"] == "# T\n\nhello world"


def test_extract_page_docx_error_row():
    row = extract_page("https://h/x.docx", b"not a zip at all")
    assert row["status"] == "error" and row["kind"] == "error"
