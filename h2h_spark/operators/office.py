"""Office-document text extraction — the OOXML tier of a training-data
pipeline.  A ``.docx`` is a ZIP container (ECMA-376 Office Open XML)
whose main document part is ``word/document.xml``; the text lives in
``w:t`` runs grouped into ``w:p`` paragraphs.  Extraction composes the
engine's ZIP machinery (central-directory read + CRC-verified member
inflate, ``sources/zipsrc.py``) with a namespace-aware ElementTree walk
— one task per batch of files, blobs never shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

_W_NS = (
    "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
)

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.main'
    '+xml"/></Types>'
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/></Relationships>'
)


def write_docx(path: str, paragraphs: Sequence[str]) -> None:
    """Fixture/test writer: a minimal but structurally real ECMA-376
    document (content types, package rels, one document part).
    Deterministic: pinned timestamps, sorted member order."""
    import zipfile
    from xml.sax.saxutils import escape

    body = "".join(
        f"<w:p><w:r><w:t>{escape(p)}</w:t></w:r></w:p>"
        for p in paragraphs
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        + body + "</w:body></w:document>"
    )
    pinned = (2024, 1, 1, 0, 0, 0)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _RELS),
            ("word/document.xml", doc),
        ):
            info = zipfile.ZipInfo(name, date_time=pinned)
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, data)


def extract_docx_text(data: bytes) -> tuple[list[str], int]:
    """Parse one in-memory .docx: returns ``(paragraph_texts,
    n_words)``.  Loud on a missing document part or malformed XML —
    never a silently empty document."""
    import io
    import zipfile
    from xml.etree import ElementTree

    try:
        z = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not a ZIP/OOXML container: {e}") from None
    try:
        xml = z.read("word/document.xml")
    except KeyError:
        raise ValueError(
            "no word/document.xml part — not a .docx document"
        ) from None
    root = ElementTree.fromstring(xml)
    paragraphs: list[str] = []
    n_words = 0
    for p in root.iter(f"{_W_NS}p"):
        text = "".join(t.text or "" for t in p.iter(f"{_W_NS}t"))
        paragraphs.append(text)
        n_words += len(text.split())
    return paragraphs, n_words


def docx_stats(spark: SparkSession, path: str) -> DataFrame:
    """One row per ``.docx`` under ``path``: ``(file, n_paragraphs,
    n_words, text_bytes, text_md5)`` where the text is the
    newline-joined paragraphs (the corpus-ingest form).  Distributed
    one-task-per-file-batch; documents never shuffle as blobs."""
    from h2h_spark.sources.util import list_part_files

    files = sorted(list_part_files(path, pattern="*.docx"))
    if not files:
        raise ValueError(f"no .docx files under {path}")
    fdf = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(min(len(files), 64))

    def _run(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                data = open(f, "rb").read()
                paragraphs, n_words = extract_docx_text(data)
                text = "\n".join(paragraphs).encode("utf-8")
                rows.append((
                    f, len(paragraphs), n_words, len(text),
                    hashlib.md5(text).hexdigest(),
                ))
            yield pd.DataFrame(
                rows, columns=["file", "n_paragraphs", "n_words",
                               "text_bytes", "text_md5"],
            )

    return fdf.mapInPandas(
        _run,
        "file string, n_paragraphs bigint, n_words bigint, "
        "text_bytes bigint, text_md5 string",
    )


# ---------------------------------------------------------------------------
# PDF metadata — the classic cross-reference walk (ISO 32000-1 §7.5:
# header, xref table, trailer dictionary; page tree via /Root → /Pages
# → /Count).  The pre-OCR triage step of a document-ingest pipeline:
# version / page count / encryption flag WITHOUT parsing content
# streams.  PDF 1.5+ cross-reference STREAMS are rejected loudly (a
# compressed-xref walk needs object-stream inflation — documented
# cliff), never silently guessed.
# ---------------------------------------------------------------------------


def build_pdf(
    n_pages: int,
    version: str = "1.4",
    encrypted: bool = False,
) -> bytes:
    """Fixture/test builder: a structurally valid classic-xref PDF with
    a real page tree, as bytes.  Content streams are empty (metadata
    fixture)."""
    import io

    buf = io.BytesIO()
    offsets: list[int] = []

    def obj(body: str) -> None:
        offsets.append(buf.tell())
        num = len(offsets)
        buf.write(f"{num} 0 obj\n{body}\nendobj\n".encode())

    buf.write(f"%PDF-{version}\n".encode())
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    obj(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>")
    for _ in range(n_pages):
        obj("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>")
    if encrypted:
        obj("<< /Filter /Standard /V 1 /R 2 /P -44 >>")
    xref_off = buf.tell()
    n = len(offsets) + 1
    buf.write(f"xref\n0 {n}\n".encode())
    buf.write(b"0000000000 65535 f \n")
    for off in offsets:
        buf.write(f"{off:010d} 00000 n \n".encode())
    trailer = f"<< /Size {n} /Root 1 0 R"
    if encrypted:
        trailer += f" /Encrypt {len(offsets)} 0 R"
    trailer += " >>"
    buf.write(
        f"trailer\n{trailer}\nstartxref\n{xref_off}\n%%EOF\n".encode()
    )
    return buf.getvalue()


def write_pdf(
    path: str,
    n_pages: int,
    version: str = "1.4",
    encrypted: bool = False,
) -> None:
    with open(path, "wb") as f:
        f.write(build_pdf(n_pages, version, encrypted))


def parse_pdf_meta(data: bytes) -> dict:
    """Classic-xref metadata walk: header version, %%EOF check,
    startxref → xref table → trailer (/Size, /Encrypt), page count by
    RESOLVING /Root → /Pages → /Count through the table (no content
    parse).  Returns ``{version, n_objects, n_pages, encrypted}``."""
    import re as _re

    m = _re.match(rb"%PDF-(\d+\.\d+)", data)
    if not m:
        raise ValueError("not a PDF (header missing)")
    version = m.group(1).decode("ascii")
    if b"%%EOF" not in data[-1024:]:
        raise ValueError("missing %%EOF marker in the last 1024 bytes")
    sx = data.rfind(b"startxref")
    if sx < 0:
        raise ValueError("missing startxref")
    xref_off = int(data[sx + 9:sx + 40].split()[0])
    if data[xref_off:xref_off + 4] != b"xref":
        raise ValueError(
            "cross-reference stream (PDF 1.5+ compressed xref) — the "
            "classic-xref walk does not decode object streams"
        )
    # parse the table: sections of "start count" then 20-byte entries
    pos = data.index(b"\n", xref_off) + 1
    offsets: dict[int, int] = {}
    while not data[pos:pos + 7].startswith(b"trailer"):
        line_end = data.index(b"\n", pos)
        head = data[pos:line_end].split()
        if len(head) != 2:
            raise ValueError(f"malformed xref section header at {pos}")
        start, count = int(head[0]), int(head[1])
        pos = line_end + 1
        for i in range(count):
            entry = data[pos:pos + 20]
            if len(entry) < 18:
                raise ValueError("truncated xref entry")
            if entry[17:18] == b"n":
                offsets[start + i] = int(entry[:10])
            pos += 20
    tre = data.index(b">>", pos)
    trailer = data[pos:tre + 2]
    sz = _re.search(rb"/Size\s+(\d+)", trailer)
    root = _re.search(rb"/Root\s+(\d+)\s+\d+\s+R", trailer)
    if not sz or not root:
        raise ValueError("trailer missing /Size or /Root")
    encrypted = b"/Encrypt" in trailer

    def load(num: int) -> bytes:
        if num not in offsets:
            raise ValueError(f"object {num} not in the xref table")
        off = offsets[num]
        end = data.index(b"endobj", off)
        return data[off:end]

    catalog = load(int(root.group(1)))
    pm = _re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", catalog)
    if not pm:
        raise ValueError("catalog has no /Pages")
    pages = load(int(pm.group(1)))
    cm = _re.search(rb"/Count\s+(\d+)", pages)
    if not cm:
        raise ValueError("page tree has no /Count")
    return {
        "version": version,
        "n_objects": int(sz.group(1)) - 1,
        "n_pages": int(cm.group(1)),
        "encrypted": encrypted,
    }


def pdf_stats(df: "DataFrame", id_col: str, data_col: str = "data"):
    """PDF metadata columns for a binary column — Arrow-batched."""
    import pandas as pd

    schema = (
        f"`{id_col}` bigint, version string, n_objects bigint, "
        "n_pages bigint, encrypted boolean"
    )

    def _run(batches):
        for pdf in batches:
            rows = []
            for rid, raw in zip(pdf[id_col], pdf[data_col]):
                m = parse_pdf_meta(bytes(raw))
                rows.append((rid, m["version"], m["n_objects"],
                             m["n_pages"], m["encrypted"]))
            yield pd.DataFrame(
                rows, columns=[id_col, "version", "n_objects", "n_pages",
                               "encrypted"],
            )

    return df.select(id_col, data_col).mapInPandas(_run, schema)
