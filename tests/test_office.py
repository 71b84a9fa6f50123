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
                 "encrypted": True, "xref_type": "table"}
    m = parse_pdf_meta(build_pdf(1))
    assert m["n_pages"] == 1 and not m["encrypted"]
    with pytest.raises(ValueError, match="header"):
        parse_pdf_meta(b"%PNG nope")
    good = build_pdf(2)
    with pytest.raises(ValueError, match="%%EOF"):
        parse_pdf_meta(good[:-8])
    # a startxref pointing into garbage (neither table nor object) is loud
    bad = bytearray(good)
    idx = bad.rindex(b"startxref")
    nl = bad.index(b"\n", idx) + 1
    bad[nl:nl + 1] = b"9"  # corrupt the offset
    with pytest.raises(ValueError):
        parse_pdf_meta(bytes(bad))


def test_pdf_xrefstream_roundtrip_and_predictors():
    from h2h_spark.operators.office import (
        build_pdf_xrefstream,
        parse_pdf_meta,
    )

    for pred in (1, 12):
        for enc in (False, True):
            m = parse_pdf_meta(build_pdf_xrefstream(
                3, version="1.6", predictor=pred, encrypted=enc
            ))
            assert m == {
                "version": "1.6",
                "n_objects": 3 + 4 + (1 if enc else 0),
                "n_pages": 3,
                "encrypted": enc,
                "xref_type": "stream",
            }


def test_pdf_xrefstream_guards():
    from h2h_spark.operators.office import (
        build_pdf_xrefstream,
        parse_pdf_meta,
    )

    good = build_pdf_xrefstream(2, predictor=12)
    # non-Flate filter rejected loudly (same-length replacement keeps
    # every offset valid)
    with pytest.raises(ValueError, match="unsupported stream /Filter"):
        parse_pdf_meta(good.replace(b"/FlateDecode", b"/LZWDeeecode"))
    # TIFF predictor rejected loudly
    with pytest.raises(ValueError, match="Predictor"):
        parse_pdf_meta(good.replace(b"/Predictor 12", b"/Predictor 02"))
    # indirect /Length rejected loudly (needs the table being built);
    # patch the XREF stream's dict (last in the file) so the startxref
    # offset — which points before it — stays valid
    plain = build_pdf_xrefstream(2, predictor=1)
    i = plain.rindex(b"/Length ")
    j = plain.index(b" ", i + 8)
    with pytest.raises(ValueError, match="indirect /Length"):
        parse_pdf_meta(
            plain[:i] + b"/Length 9 0 R" + plain[j:]
        )


def test_pdf_incremental_update_prev_chain():
    """An appended incremental update (new page object + new xref table
    with /Prev) must win newest-first: page count comes from the NEW
    page tree."""
    from h2h_spark.operators.office import build_pdf, parse_pdf_meta

    base = build_pdf(2)  # objects: 1 catalog, 2 pages, 3-4 page
    sx = base.rindex(b"startxref")
    old_xref_off = int(base[sx + 9:sx + 40].split()[0])
    buf = bytearray(base)
    # replacement /Pages object 2 claiming 7 pages (kids not enumerated
    # — triage reads /Count only)
    new_obj_off = len(buf)
    buf += b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 7 >>\nendobj\n"
    new_xref_off = len(buf)
    buf += b"xref\n2 1\n"
    buf += b"%010d 00000 n \n" % new_obj_off
    buf += (b"trailer\n<< /Size 5 /Root 1 0 R /Prev %d >>\n"
            b"startxref\n%d\n%%%%EOF\n" % (old_xref_off, new_xref_off))
    m = parse_pdf_meta(bytes(buf))
    assert m["n_pages"] == 7 and m["xref_type"] == "table"
    assert m["n_objects"] == 4
