"""ZIP64 directory records (APPNOTE §4.3.14/§4.3.15/§4.5.3) and the
false-EOCD rejection path.  Fixtures are real zipfile output rewritten
at the byte level into the zip64 layout, so the parser is exercised on
faithful record framing without needing >4 GiB files."""

import struct
import zipfile

import pytest

from h2h_spark.sources.zipsrc import read_central_directory, read_member

_EOCD_SIG = b"PK\x05\x06"


def _base_zip(path, n=20):
    contents = {f"m/{i:04d}": (b"Z%04d|" % i) * (i % 4 + 1) for i in range(n)}
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in contents.items():
            z.writestr(name, data)
    return contents


def _split_eocd(data):
    idx = data.rfind(_EOCD_SIG)
    assert idx >= 0
    n_entries, cd_size, cd_off = struct.unpack_from("<HII", data, idx + 10)
    return idx, n_entries, cd_size, cd_off


def _zip64_tail(n_entries, cd_size, cd_off, eocd64_off):
    eocd64 = (
        b"PK\x06\x06"
        + struct.pack("<QHHII", 44, 45, 45, 0, 0)
        + struct.pack("<QQQQ", n_entries, n_entries, cd_size, cd_off)
    )
    locator = b"PK\x06\x07" + struct.pack("<IQI", 0, eocd64_off, 1)
    sentinel_eocd = _EOCD_SIG + struct.pack(
        "<HHHHIIH", 0, 0, 0xFFFF, 0xFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0
    )
    return eocd64 + locator + sentinel_eocd


def _verify_members(path, contents):
    ms = read_central_directory(path)
    assert {m["name"] for m in ms} == set(contents)
    with open(path, "rb") as f:
        for m in ms:
            assert read_member(f, m) == contents[m["name"]]


def test_zip64_eocd_roundtrip(tmp_work):
    path = f"{tmp_work}/z64.zip"
    contents = _base_zip(path)
    data = open(path, "rb").read()
    idx, n, cd_size, cd_off = _split_eocd(data)
    assert cd_off + cd_size == idx  # zipfile writes the CD contiguously
    with open(path, "wb") as f:
        f.write(data[:idx])
        f.write(_zip64_tail(n, cd_size, cd_off, eocd64_off=idx))
    _verify_members(path, contents)


def test_zip64_sentinels_without_locator_raise(tmp_work):
    path = f"{tmp_work}/noloc.zip"
    _base_zip(path, n=3)
    data = open(path, "rb").read()
    idx, n, cd_size, cd_off = _split_eocd(data)
    sentinel = _EOCD_SIG + struct.pack(
        "<HHHHIIH", 0, 0, 0xFFFF, 0xFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0
    )
    with open(path, "wb") as f:
        f.write(data[:idx] + sentinel)
    with pytest.raises(ValueError, match="locator"):
        read_central_directory(path)


def test_zip_comment_embedded_false_eocd_rejected(tmp_work):
    # A fake EOCD appended after the real one (e.g. smuggled in a
    # comment) is the LAST signature in the tail; its directory bounds
    # overlap the record itself, so the reader must refuse rather than
    # parse an attacker- or corruption-chosen directory.
    path = f"{tmp_work}/fake.zip"
    _base_zip(path, n=3)
    data = open(path, "rb").read()
    fake = _EOCD_SIG + struct.pack(
        "<HHHHIIH", 0, 0, 3, 3, 1000, len(data), 0
    )
    with open(path, "wb") as f:
        f.write(data + fake)
    with pytest.raises(ValueError, match="overlaps"):
        read_central_directory(path)


def test_zip64_per_entry_extra_field(tmp_work):
    # Rewrite one CD entry to carry its local-header offset in a zip64
    # extra field behind the 0xFFFFFFFF sentinel.
    path = f"{tmp_work}/entry64.zip"
    contents = _base_zip(path, n=1)
    data = open(path, "rb").read()
    idx, n, cd_size, cd_off = _split_eocd(data)
    cd = bytearray(data[cd_off:idx])
    nlen, elen, clen = struct.unpack_from("<HHH", cd, 28)
    assert elen == 0 and clen == 0
    real_off = struct.unpack_from("<I", cd, 42)[0]
    struct.pack_into("<I", cd, 42, 0xFFFFFFFF)
    extra = struct.pack("<HHQ", 0x0001, 8, real_off)
    struct.pack_into("<H", cd, 30, len(extra))
    cd = bytes(cd[:46 + nlen]) + extra + bytes(cd[46 + nlen:])
    eocd = bytearray(data[idx:])
    struct.pack_into("<I", eocd, 12, len(cd))
    with open(path, "wb") as f:
        f.write(data[:cd_off] + cd + bytes(eocd))
    _verify_members(path, contents)


def test_zip64_missing_extra_raises(tmp_work):
    # Sentinel offset with NO zip64 extra field: loud failure, not a
    # read at 0xFFFFFFFF.
    path = f"{tmp_work}/bad64.zip"
    _base_zip(path, n=1)
    data = open(path, "rb").read()
    idx, n, cd_size, cd_off = _split_eocd(data)
    cd = bytearray(data[cd_off:idx])
    struct.pack_into("<I", cd, 42, 0xFFFFFFFF)
    with open(path, "wb") as f:
        f.write(data[:cd_off] + bytes(cd) + data[idx:])
    with pytest.raises(ValueError, match="no .*zip64 extra|zip64 extra"):
        read_central_directory(path)
