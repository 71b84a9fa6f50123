"""OOXML (.docx) extraction: ZIP+XML composition."""

import os

import pytest

from h2h_spark.operators.office import (
    docx_stats,
    extract_docx_text,
    write_docx,
)


def test_docx_roundtrip_unicode_and_escapes(tmp_work):
    p = f"{tmp_work}/a.docx"
    paras = ["hello world", "ümlaut & <tag> 'quoted'", ""]
    write_docx(p, paras)
    got, n_words = extract_docx_text(open(p, "rb").read())
    assert got == paras
    assert n_words == 2 + 4 + 0
    # stdlib zipfile interoperability (a real consumer can open it)
    import zipfile

    z = zipfile.ZipFile(p)
    assert "word/document.xml" in z.namelist()


def test_docx_loud_failures(tmp_work):
    with pytest.raises(ValueError, match="ZIP"):
        extract_docx_text(b"plain bytes")
    # a zip WITHOUT the document part is not a docx
    import zipfile

    p = f"{tmp_work}/notdocx.zip"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("data.txt", "x")
    with pytest.raises(ValueError, match="word/document.xml"):
        extract_docx_text(open(p, "rb").read())


def test_docx_stats_distributed(spark, tmp_work):
    d = f"{tmp_work}/corpus"
    os.makedirs(d)
    for i in range(20):
        write_docx(f"{d}/doc_{i}.docx", [f"p{j}" for j in range(i % 4 + 1)])
    df = docx_stats(spark, d)
    rows = {os.path.basename(r["file"]): r for r in df.collect()}
    assert len(rows) == 20
    assert rows["doc_7.docx"]["n_paragraphs"] == 4
    assert rows["doc_7.docx"]["n_words"] == 4
    with pytest.raises(ValueError, match="no .docx"):
        docx_stats(spark, f"{tmp_work}/empty_nope")


def test_pdf_meta_roundtrip_and_guards():
    from h2h_spark.operators.office import build_pdf, parse_pdf_meta

    m = parse_pdf_meta(build_pdf(5, version="1.7", encrypted=True))
    assert m == {"version": "1.7", "n_objects": 8, "n_pages": 5,
                 "encrypted": True}
    m = parse_pdf_meta(build_pdf(1))
    assert m["n_pages"] == 1 and not m["encrypted"]
    with pytest.raises(ValueError, match="header"):
        parse_pdf_meta(b"%PNG nope")
    good = build_pdf(2)
    with pytest.raises(ValueError, match="%%EOF"):
        parse_pdf_meta(good[:-8])
    # a startxref pointing at an object (the xref-stream shape) is loud
    bad = bytearray(good)
    idx = bad.rindex(b"startxref")
    nl = bad.index(b"\n", idx) + 1
    bad[nl:nl + 1] = b"9"  # corrupt the offset
    with pytest.raises(ValueError, match="xref"):
        parse_pdf_meta(bytes(bad))
