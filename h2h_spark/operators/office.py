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
