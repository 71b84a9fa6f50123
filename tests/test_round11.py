"""Round-11 regression battery for the r10 ADVICE findings: avro
4-byte float decode, zst point-fetch byte-wise line split, safetensors
header validation, zarr null fill_value, ORC large-footer retry."""

import json
import os
import struct

import pytest


# ---------------------------------------------------------------------------
# ADVICE: avro 'float' is 4 bytes on the wire, not 8
# ---------------------------------------------------------------------------


def _write_float_ocf(path: str, rows: list[tuple[int, float]]) -> None:
    """Hand-write an OCF file the way an EXTERNAL avro writer would:
    schema declares a real avro 'float' field (4-byte IEEE single)."""
    from h2h_spark.sources.avro import (
        _enc_bytes,
        _enc_str,
        _zigzag_encode,
    )

    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "id", "type": "long"},
                   {"name": "x", "type": "float"}],
    }
    sync = b"\x01" * 16
    out = bytearray(b"Obj\x01")
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": b"null"}
    out += _zigzag_encode(len(meta))
    for k, v in sorted(meta.items()):
        out += _enc_str(k)
        out += _enc_bytes(v)
    out += _zigzag_encode(0)
    out += sync
    body = bytearray()
    for i, x in rows:
        body += _zigzag_encode(i)
        body += struct.pack("<f", x)  # 4 bytes — the avro float wire size
    out += _zigzag_encode(len(rows))
    out += _zigzag_encode(len(body))
    out += body
    out += sync
    with open(path, "wb") as f:
        f.write(out)


def test_avro_external_float_decodes_4_bytes(spark, tmp_work):
    """A float field from an external writer must decode 4 bytes per
    value (widened to double), not desync the stream by reading 8."""
    from h2h_spark.sources.avro import read_avro

    p = f"{tmp_work}/float.avro"
    rows = [(1, 1.5), (2, -0.25), (3, 3.75), (4, 1e10)]
    _write_float_ocf(p, rows)
    got = sorted((r.id, r.x) for r in read_avro(spark, p).collect())
    # 1.5/-0.25/3.75 are exact in binary32; 1e10 rounds to float32 first
    want = [(i, float(struct.unpack("<f", struct.pack("<f", x))[0]))
            for i, x in rows]
    assert got == want
    # widened: the Spark-side type is double
    [xf] = [f for f in read_avro(spark, p).schema.fields if f.name == "x"]
    assert xf.dataType.typeName() == "double"


def test_avro_float_roundtrip_symmetric(tmp_work):
    """Encoding with a decode-built plan writes 4-byte floats back."""
    from h2h_spark.sources.avro import (
        _decode_value,
        _encode_value,
        _type_plan,
    )

    plan = _type_plan("float")
    out = bytearray()
    _encode_value(plan, 2.5, out)
    assert len(out) == 4
    v, pos = _decode_value(plan, bytes(out), 0)
    assert (v, pos) == (2.5, 4)


# ---------------------------------------------------------------------------
# ADVICE: point-fetch must split lines as BYTES (U+2028 inside JSON)
# ---------------------------------------------------------------------------


def test_fetch_zst_frames_unicode_linebreak_chars(spark, tmp_work):
    """U+2028/U+2029/U+0085 are legal unescaped inside JSON strings;
    str.splitlines() breaks on them and would shift every subsequent
    line_no off the scan-built index.  Fetch must match the scan."""
    from h2h_spark.sources.jsonl import (
        fetch_zst_frames,
        write_jsonl_zst_members,
    )

    lines = ['{"i": 0, "t": "a b"}',
             '{"i": 1, "t": "c de"}',
             '{"i": 2, "t": "plain"}']
    p = f"{tmp_work}/u2028.jsonl.zst"
    write_jsonl_zst_members(p, lines, lines_per_member=8, seekable=True)
    locs = spark.createDataFrame([(p, 0)], "file string, frame bigint")
    rows = sorted(fetch_zst_frames(spark, locs).collect(),
                  key=lambda r: r.line_no)
    assert [r.line for r in rows] == lines
    assert [r.line_no for r in rows] == [0, 1, 2]
    # every fetched line is still one valid JSON document
    assert [json.loads(r.line)["i"] for r in rows] == [0, 1, 2]


# ---------------------------------------------------------------------------
# ADVICE: safetensors header validation is loud, not TypeError
# ---------------------------------------------------------------------------


def _write_raw_safetensors(path: str, header: dict, data: bytes) -> None:
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        f.write(data)


def test_safetensors_missing_offsets_is_loud(tmp_work):
    from h2h_spark.sources.safetensors import read_header

    p = f"{tmp_work}/noff.safetensors"
    _write_raw_safetensors(
        p, {"w": {"dtype": "F32", "shape": [2]}}, b"\x00" * 8
    )
    with pytest.raises(ValueError, match="data_offsets"):
        read_header(p)
    # and the error names the tensor
    try:
        read_header(p)
    except ValueError as e:
        assert "'w'" in str(e)


def test_safetensors_malformed_shape_is_loud(tmp_work):
    from h2h_spark.sources.safetensors import read_header

    p = f"{tmp_work}/noshape.safetensors"
    _write_raw_safetensors(
        p, {"w": {"dtype": "F32", "data_offsets": [0, 8]}}, b"\x00" * 8
    )
    with pytest.raises(ValueError, match="shape"):
        read_header(p)
    p2 = f"{tmp_work}/badshape.safetensors"
    _write_raw_safetensors(
        p2,
        {"w": {"dtype": "F32", "shape": [2, -1], "data_offsets": [0, 8]}},
        b"\x00" * 8,
    )
    with pytest.raises(ValueError, match="shape"):
        read_header(p2)


# ---------------------------------------------------------------------------
# ADVICE: zarr absent chunk with null fill_value must not fabricate 0s
# ---------------------------------------------------------------------------


def _zarr_store(tmp_work, name, fill_value):
    import numpy as np

    from h2h_spark.sources.zarr import write_zarr_chunk, write_zarray

    store = f"{tmp_work}/{name}"
    mat = np.arange(12, dtype="<f4").reshape(6, 2)
    write_zarray(store, (6, 2), (2, 2), "<f4", fill_value=fill_value)
    for ci in range(3):
        write_zarr_chunk(store, ci, 0, mat[ci * 2:(ci + 1) * 2])
    os.remove(f"{store}/1.0")  # rows 2-3 now come from fill_value
    return store


def test_zarr_absent_chunk_null_fill_is_loud(spark, tmp_work):
    """fill_value null means UNDEFINED per the zarr v2 spec — an absent
    chunk must fail loud, not fabricate zeros."""
    from h2h_spark.sources.zarr import read_zarr

    store = _zarr_store(tmp_work, "z_nullfill", fill_value=None)
    with pytest.raises(Exception, match="fill_value"):
        read_zarr(spark, store).collect()


def test_zarr_absent_chunk_real_fill_value_used(spark, tmp_work):
    """A DEFINED fill_value (non-zero, to prove it is read) still
    materializes absent chunks."""
    from h2h_spark.sources.zarr import read_zarr

    store = _zarr_store(tmp_work, "z_fill7", fill_value=7.0)
    rows = {r.row_idx: list(r.vec) for r in
            read_zarr(spark, store).collect()}
    assert rows[2] == [7.0, 7.0] and rows[3] == [7.0, 7.0]
    assert rows[0] == [0.0, 1.0] and rows[5] == [10.0, 11.0]


# ---------------------------------------------------------------------------
# ADVICE: ORC footers larger than the 16 KiB tail window must retry
# ---------------------------------------------------------------------------


def _pb_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_field(field: int, wt: int, payload) -> bytes:
    key = _pb_varint((field << 3) | wt)
    if wt == 0:
        return key + _pb_varint(payload)
    return key + _pb_varint(len(payload)) + payload


def _fake_orc(path: str, n_stripes: int) -> None:
    """Synthesize the TAIL of an ORC file (uncompressed footer with
    n_stripes stripe-information entries + postscript + ps_len byte)
    behind a padding 'data' region.  parse_orc_meta never reads the
    stripe bytes themselves, so padding suffices."""
    footer = bytearray()
    footer += _pb_field(2, 0, 123456)            # contentLength
    total_rows = 0
    off = 3
    for i in range(n_stripes):
        si = (_pb_field(1, 0, off) + _pb_field(2, 0, 10)
              + _pb_field(3, 0, 100) + _pb_field(4, 0, 20)
              + _pb_field(5, 0, 50))
        footer += _pb_field(3, 2, si)            # stripes (repeated)
        off += 130
        total_rows += 50
    footer += _pb_field(4, 2, _pb_field(1, 0, 0))  # one type entry
    footer += _pb_field(6, 0, total_rows)        # numberOfRows
    ps = (_pb_field(1, 0, len(footer))           # footerLength
          + _pb_field(2, 0, 0)                   # compression NONE
          + _pb_field(8000, 2, b"ORC"))          # magic
    with open(path, "wb") as f:
        f.write(b"ORC")
        f.write(b"\x01" * 4096)                  # stand-in stripe data
        f.write(bytes(footer))
        f.write(ps)
        f.write(bytes([len(ps)]))


def test_orc_large_footer_reread(tmp_work):
    """A footer bigger than the initial 16 KiB window (many stripes)
    must be re-read, not rejected."""
    from h2h_spark.sources.meta import parse_orc_meta

    p = f"{tmp_work}/wide.orc"
    _fake_orc(p, n_stripes=2500)                 # footer ≈ 30 KiB
    m = parse_orc_meta(p)
    assert m["codec"] == "NONE"
    assert len(m["stripes"]) == 2500
    assert m["n_rows"] == 2500 * 50
    assert m["stripes"][0]["offset"] == 3
    assert m["stripes"][-1]["n_rows"] == 50


def test_orc_small_footer_still_single_read(tmp_work):
    from h2h_spark.sources.meta import parse_orc_meta

    p = f"{tmp_work}/small.orc"
    _fake_orc(p, n_stripes=3)
    m = parse_orc_meta(p)
    assert len(m["stripes"]) == 3 and m["n_rows"] == 150


def test_orc_footer_longer_than_file_is_loud(tmp_work):
    from h2h_spark.sources.meta import parse_orc_meta

    p = f"{tmp_work}/lying.orc"
    footer = _pb_field(6, 0, 1)
    ps = (_pb_field(1, 0, 10**9)                 # absurd footerLength
          + _pb_field(2, 0, 0) + _pb_field(8000, 2, b"ORC"))
    with open(p, "wb") as f:
        f.write(b"ORC" + footer + ps + bytes([len(ps)]))
    with pytest.raises(ValueError, match="exceeds file size"):
        parse_orc_meta(p)


# ---------------------------------------------------------------------------
# ORC LZ4 block codec (round-11: VERDICT item 4)
# ---------------------------------------------------------------------------


def test_lz4_block_roundtrip_against_pyarrow():
    """Decoder vs pyarrow's lz4_raw COMPRESSOR (block format — the
    reference implementation)."""
    import pyarrow as pa

    from h2h_spark.sources.meta import _lz4_block_decompress

    c = pa.Codec("lz4_raw")
    for data in (
        b"",
        b"abc",
        b"a" * 1000,                          # RLE → overlapping match
        bytes(range(256)) * 40,               # incompressible-ish
        (b"the quick brown fox " * 97)[:1777],
        b"\x00" * 65536 + b"tail",
    ):
        comp = c.compress(data, asbytes=True)
        assert _lz4_block_decompress(comp, "t") == data


def test_lz4_block_handcrafted_and_guards():
    from h2h_spark.sources.meta import _lz4_block_decompress

    # literals=4 "abcd", match off=4 len=4 (copies "abcd"), final
    # literal-only sequence "Z"
    blk = bytes([0x40]) + b"abcd" + bytes([0x04, 0x00]) + bytes([0x10]) + b"Z"
    assert _lz4_block_decompress(blk, "t") == b"abcdabcdZ"
    # overlapping match: 1 literal "x", off=1 len=8 → "x" * 9
    blk = bytes([0x14]) + b"x" + bytes([0x01, 0x00]) + bytes([0x00])
    assert _lz4_block_decompress(blk, "t") == b"x" * 9
    # invalid offset 0 is loud
    with pytest.raises(ValueError, match="offset"):
        _lz4_block_decompress(bytes([0x14]) + b"x" + b"\x00\x00\x00", "t")
    # offset beyond produced output is loud
    with pytest.raises(ValueError, match="offset"):
        _lz4_block_decompress(bytes([0x14]) + b"x" + b"\x09\x00\x00", "t")
    # truncated literal run is loud
    with pytest.raises(ValueError, match="truncated|past end"):
        _lz4_block_decompress(bytes([0xF0, 0xFF]), "t")


def test_orc_lz4_chunked_metadata_stream():
    """LZ4 chunks inside ORC's 3-byte chunk framing, mixed with an
    isOriginal chunk."""
    import pyarrow as pa

    from h2h_spark.sources.meta import _orc_decompress

    part1 = b"footer-bytes " * 40
    comp = pa.Codec("lz4_raw").compress(part1, asbytes=True)
    hdr = ((len(comp) << 1) | 0).to_bytes(3, "little")
    orig = b"RAWTAIL"
    hdr2 = ((len(orig) << 1) | 1).to_bytes(3, "little")
    stream = hdr + comp + hdr2 + orig
    assert _orc_decompress(stream, "LZ4", "t") == part1 + orig


# ---------------------------------------------------------------------------
# WAT/WET malformed-record hardening (round-11: VERDICT item 6)
# ---------------------------------------------------------------------------


def test_warc_framing_loud_battery(tmp_work):
    """WARC framing stays LOUD (never resyncs silently mid-file) for:
    missing mandatory headers, non-numeric Content-Length, truncated
    final record."""
    from h2h_spark.sources.warc import _RangeScanner, write_warc_records

    # missing Content-Length in record 2 of 3
    p = f"{tmp_work}/missing_cl.warc"
    good = ({"WARC-Type": "response", "WARC-Record-ID": "<a>",
             }, b"payload-1")
    with open(p, "wb") as f:
        from h2h_spark.sources.warc import write_warc_records_to
        write_warc_records_to(f, [good])
        f.write(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n")
    with pytest.raises(ValueError, match="malformed WARC record"):
        list(_RangeScanner(p, 0, 10**9).records())

    # non-numeric Content-Length
    p2 = f"{tmp_work}/nan_cl.warc"
    with open(p2, "wb") as f:
        f.write(b"WARC/1.0\r\nWARC-Type: x\r\nContent-Length: ten\r\n\r\n")
    with pytest.raises(ValueError, match="malformed WARC record"):
        list(_RangeScanner(p2, 0, 10**9).records())

    # truncated envelope: declared 999 bytes, file ends early
    p3 = f"{tmp_work}/trunc.warc"
    with open(p3, "wb") as f:
        write_warc_records_to(f, [good])
        f.write(b"WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 999\r\n\r\nxx")
    with pytest.raises(ValueError, match="truncated WARC payload"):
        list(_RangeScanner(p3, 0, 10**9).records())


def test_utf8_valid_cases(spark):
    from h2h_spark.operators.watwet import utf8_valid

    cases = [
        (b"plain ascii", True),
        ("unicode ✓ über".encode("utf-8"), True),
        (b"", True),
        (b"\xc3\x28", False),           # bad continuation
        (b"\xff\xfe\x00\x01", False),   # BOM-ish garbage
        (b"ok then \x80 broken", False),  # bare continuation byte
        (b"\xed\xa0\x80", False),       # UTF-8-encoded surrogate
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, (b, _) in enumerate(cases)],
        "i int, payload binary",
    )
    got = {r.i: r.ok for r in
           df.select("i", utf8_valid("payload").alias("ok")).collect()}
    for i, (b, want) in enumerate(cases):
        assert got[i] == want, (i, b)


def test_wat_links_status_classification(spark):
    """ok / no_links / corrupt classification; links never NULL."""
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType, StringType, StructField, StructType,
    )

    from h2h_spark.operators.watwet import wat_links_status

    env_t = StructType([StructField("Envelope", StructType([
        StructField("Payload-Metadata", StructType([
            StructField("HTTP-Response-Metadata", StructType([
                StructField("HTML-Metadata", StructType([
                    StructField("Links", ArrayType(StructType([
                        StructField("url", StringType()),
                    ]))),
                ])),
            ])),
        ])),
    ]))])
    good = _json.dumps({"Envelope": {"Payload-Metadata": {
        "HTTP-Response-Metadata": {"HTML-Metadata": {"Links": [
            {"url": "https://a.org"}, {"url": "https://b.org"},
        ]}}}}}).encode()
    nolinks = _json.dumps({"Envelope": {"Payload-Metadata": {
        "Actual-Content-Type": "image/png"}}}).encode()
    rows = [
        (0, bytearray(good)),
        (1, bytearray(nolinks)),
        (2, bytearray(good[: len(good) // 2])),   # truncated JSON
        (3, bytearray(b"\xff\xfe not json")),     # non-UTF-8
        (4, bytearray(b"[1, 2, 3]")),             # JSON, wrong shape
    ]
    df = spark.createDataFrame(rows, "i int, payload binary")
    out = wat_links_status(df, "payload", env_t)
    got = {r.i: (r.wat_status, len(r.links)) for r in out.collect()}
    assert got[0] == ("ok", 2)
    assert got[1] == ("no_links", 0)
    assert got[2][0] == "corrupt" and got[2][1] == 0
    assert got[3] == ("corrupt", 0)
    assert got[4][0] in ("corrupt",)  # wrong shape parses to NULL struct
    # NOTHING dropped: every input row classified
    assert len(got) == len(rows)


def test_wet_text_status_keeps_payload(spark):
    from h2h_spark.operators.watwet import wet_text_status

    rows = [(0, bytearray(b"good text")), (1, bytearray(b"\xc3\x28bin"))]
    df = spark.createDataFrame(rows, "i int, payload binary")
    got = {r.i: (r.wet_status, bytes(r.payload)) for r in
           wet_text_status(df, "payload").collect()}
    assert got[0] == ("ok", b"good text")
    # quarantined rows keep their original bytes for audit/retry
    assert got[1] == ("binary_quarantined", b"\xc3\x28bin")
