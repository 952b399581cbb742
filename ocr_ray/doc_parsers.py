"""Standalone document parsers: markdown, plain text, python/java code, docx.

The reference dispatches parsers by file extension
(utils/text/parsers/__init__.py:173-191) and normalizes the paragraph list
(strip text, drop empty-text paragraphs, default type 'text' —
__init__.py:203-218).  These functions reproduce WHAT each parser emits
over an in-memory payload (our input is a parquet binary column, not a
filesystem), feeding the same ``assemble_text`` post-processing as the
HTML/PDF branches so the whole dispatch stays byte-deterministic.

- markdown  — md_parser.py:22-88: blank-line paragraphing, ``` code
  fences (language from the fence tag, default 'text'), ``![`` media
  lines routed by extension, ``#`` heading lines updating a section stack
  (the heading line itself stays in the paragraph text).  Divergence: the
  reference's unknown-media branch crashes on an unimported ``warnings``
  module; we skip the line instead.
- txt       — txt_parser.py:14-23: split on '\\n\\n'.
- python    — py_parser.py:16-26: split on blank lines followed by
  def/#/class/@, all paragraphs type 'code' language 'python'.
- java      — java_parser.py:14-19: whole payload as one code paragraph.
- docx      — docx_parser.py:14-21 uses python-docx (one paragraph per
  ``Document(...).paragraphs`` entry); not available here, so the zip +
  WordprocessingML XML is read directly with stdlib zipfile/ElementTree —
  same output: one text paragraph per ``<w:p>``.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

_AUDIO_EXT = ("wav", "mp3", "flac", "opus", "ogg")
_IMAGE_EXT = ("gif", "png", "jpeg", "jpg")
_VIDEO_EXT = ("mp4", "mov", "ovg", "avi")

_PYTHON_SPLIT_RE = re.compile(r"\n\s*\n(?=def|\#|class|\@)")

_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

# url path extension -> parser kind (the extension registry analog,
# parsers/__init__.py:35-38; html/pdf payloads keep their sniff-based path)
EXTENSION_KINDS = {
    "md": "md",
    "markdown": "md",
    "txt": "txt",
    "docx": "docx",
    "py": "py",
    "java": "java",
}


def url_extension(url: str) -> str:
    """Lower-case extension of the url path (query/fragment stripped)."""
    path = url.split("?", 1)[0].split("#", 1)[0]
    tail = path.rsplit("/", 1)[-1]
    if "." not in tail:
        return ""
    return tail.rpartition(".")[2].lower()


def normalize(paragraphs: list[dict]) -> list[dict]:
    """strip + drop-empty + default-type (normalize_paragraphs,
    parsers/__init__.py:203-218), plus deterministic ``order``."""
    out = []
    for p in paragraphs:
        if "type" not in p:
            p = dict(p, type="text")
        if "text" in p:
            p = dict(p, text=p["text"].strip())
        if not p.get("text", True):
            continue
        out.append(dict(p, order=len(out)))
    return out


def parse_txt(text: str, sep: str = "\n\n") -> list[dict]:
    return normalize([{"type": "text", "text": para} for para in text.split(sep)])


def parse_python(text: str) -> list[dict]:
    return normalize(
        [
            {"type": "code", "text": part, "language": "python"}
            for part in _PYTHON_SPLIT_RE.split(text)
        ]
    )


def parse_java(text: str) -> list[dict]:
    return normalize([{"type": "code", "text": text, "language": "java"}])


def parse_markdown(text: str) -> list[dict]:
    paragraphs: list[dict] = []
    buf, code_type, section = "", None, []

    def flush(buf: str) -> str:
        if buf:
            p = {"type": "text", "text": buf.strip()}
            if section:
                p["section"] = list(section)
            if code_type:
                p.update({"type": "code", "language": code_type})
            paragraphs.append(p)
        return ""

    for line in (l.strip() for l in text.splitlines()):
        if not line:
            buf = flush(buf)
            continue
        if line.startswith("```"):
            buf = flush(buf)
            code_type = None if code_type else (line[3:].strip() or "text")
            continue
        elif code_type:
            pass
        elif line.startswith("!["):
            buf = flush(buf)
            data = line[2:].split("]")[0]
            for exts, kind in (
                (_IMAGE_EXT, "image"), (_AUDIO_EXT, "audio"), (_VIDEO_EXT, "video")
            ):
                if data.endswith(exts):
                    # no 'text' key: normalize keeps non-text paragraphs
                    paragraphs.append(
                        {"type": kind, "media": data, "section": list(section)}
                    )
                    break
            continue
        elif line.startswith("#"):
            buf = flush(buf)
            prefix, _, title = line.partition(" ")
            section = section[: len(prefix) - 1] + [title]
        if buf:
            buf += "\n"
        buf += line
    flush(buf)
    return normalize(paragraphs)


def parse_docx(payload: bytes) -> list[dict]:
    """One text paragraph per ``<w:p>`` of word/document.xml (the
    python-docx ``Document.paragraphs`` contract, docx_parser.py:17-21)."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        xml = zf.read("word/document.xml")
    root = ET.fromstring(xml)
    paragraphs = []
    for p in root.iter(_W_NS + "p"):
        runs = [t.text or "" for t in p.iter(_W_NS + "t")]
        paragraphs.append({"type": "text", "text": "".join(runs)})
    return normalize(paragraphs)


def build_docx(paragraph_texts: list[str]) -> bytes:
    """Minimal deterministic .docx payload (test/synth helper — fixed zip
    timestamps so identical input bytes always produce identical output)."""
    from xml.sax.saxutils import escape

    body = "".join(
        "<w:p><w:r><w:t xml:space=\"preserve\">{}</w:t></w:r></w:p>".format(escape(t))
        for t in paragraph_texts
    )
    doc = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
        "<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\">"
        "<w:body>{}</w:body></w:document>"
    ).format(body)
    content_types = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">"
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/>"
        "<Override PartName=\"/word/document.xml\" ContentType=\"application/vnd."
        "openxmlformats-officedocument.wordprocessingml.document.main+xml\"/></Types>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in (
            ("[Content_Types].xml", content_types),
            ("word/document.xml", doc),
        ):
            info = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return buf.getvalue()
