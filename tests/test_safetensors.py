"""safetensors source: header validation, row-range splits, dtype
widening, loud failure paths."""

import numpy as np
import pytest

from h2h_spark.sources.safetensors import (
    read_header,
    read_safetensors,
    safetensors_meta,
    write_safetensors,
)


def _write_basic(path, n=50, d=8, seed=3):
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((n, d)).astype("<f4")
    write_safetensors(
        str(path), {"emb": emb, "ids": np.arange(n, dtype="<i8").reshape(n, 1)},
        metadata={"seed": seed},
    )
    return emb


def test_header_roundtrip_and_validation(tmp_path):
    p = tmp_path / "a.safetensors"
    _write_basic(p)
    header, data_start = read_header(str(p))
    assert header["emb"]["dtype"] == "F32"
    assert header["emb"]["shape"] == [50, 8]
    assert header["ids"]["data_offsets"][0] == 50 * 8 * 4
    assert data_start == 8 + len(
        open(p, "rb").read()[8:].split(b"}}", 1)[0]
    ) + 2


def test_header_loud_failures(tmp_path):
    p = tmp_path / "bad.safetensors"
    # truncated header length
    p.write_bytes(b"\x01\x02")
    with pytest.raises(ValueError, match="truncated"):
        read_header(str(p))
    # absurd header length (not a safetensors file)
    p.write_bytes(b"\xff" * 8 + b"{}")
    with pytest.raises(ValueError, match="100 MB"):
        read_header(str(p))
    # gapped offsets
    import json
    import struct

    hdr = {
        "a": {"dtype": "F32", "shape": [1, 2], "data_offsets": [0, 8]},
        "b": {"dtype": "F32", "shape": [1, 2], "data_offsets": [12, 20]},
    }
    hj = json.dumps(hdr).encode()
    p.write_bytes(struct.pack("<Q", len(hj)) + hj + b"\x00" * 20)
    with pytest.raises(ValueError, match="contiguous"):
        read_header(str(p))
    # byte span != shape product
    hdr = {"a": {"dtype": "F32", "shape": [2, 2], "data_offsets": [0, 8]}}
    hj = json.dumps(hdr).encode()
    p.write_bytes(struct.pack("<Q", len(hj)) + hj + b"\x00" * 8)
    with pytest.raises(ValueError, match="byte span"):
        read_header(str(p))
    # data past EOF
    hdr = {"a": {"dtype": "F32", "shape": [4, 2], "data_offsets": [0, 32]}}
    hj = json.dumps(hdr).encode()
    p.write_bytes(struct.pack("<Q", len(hj)) + hj + b"\x00" * 8)
    with pytest.raises(ValueError, match="past end"):
        read_header(str(p))
    # unsupported dtype
    hdr = {"a": {"dtype": "C64", "shape": [1, 2], "data_offsets": [0, 4]}}
    hj = json.dumps(hdr).encode()
    p.write_bytes(struct.pack("<Q", len(hj)) + hj + b"\x00" * 4)
    with pytest.raises(ValueError, match="dtype"):
        read_header(str(p))


def test_row_scan_multi_split_bit_exact(spark, tmp_path):
    emb0 = _write_basic(tmp_path / "s0.safetensors", n=70, seed=1)
    emb1 = _write_basic(tmp_path / "s1.safetensors", n=30, seed=2)
    # rows_per_split=16 -> 5 + 2 splits
    df = read_safetensors(spark, str(tmp_path), "emb", rows_per_split=16)
    assert df.rdd.getNumPartitions() == 7
    rows = df.collect()
    assert len(rows) == 100
    by_file = {}
    for r in rows:
        by_file.setdefault(r.file.rsplit("/", 1)[-1], {})[r.row_idx] = r.vec
    got0 = np.array([by_file["s0.safetensors"][i] for i in range(70)],
                    dtype="<f4")
    got1 = np.array([by_file["s1.safetensors"][i] for i in range(30)],
                    dtype="<f4")
    assert (got0 == emb0).all() and (got1 == emb1).all()


def test_dtype_widening_and_1d_guard(spark, tmp_path):
    p = tmp_path / "w.safetensors"
    write_safetensors(str(p), {
        "half": np.arange(12, dtype="<f2").reshape(4, 3),
        "bytes": np.arange(12, dtype="<u1").reshape(4, 3),
        "flags": np.array([[0, 1], [1, 0]], dtype="<u1"),
        "flat": np.arange(5, dtype="<i4"),
    })
    # F16 widens to float32
    half = read_safetensors(spark, str(tmp_path), "half").orderBy("row_idx")
    assert half.schema["vec"].dataType.simpleString() == "array<float>"
    assert half.collect()[1].vec == [3.0, 4.0, 5.0]
    # U8 widens to smallint
    u8 = read_safetensors(spark, str(tmp_path), "bytes").orderBy("row_idx")
    assert u8.schema["vec"].dataType.simpleString() == "array<smallint>"
    assert u8.collect()[3].vec == [9, 10, 11]
    # 1-D tensor asked for as rows is loud
    with pytest.raises(Exception, match="2-D"):
        read_safetensors(spark, str(tmp_path), "flat").collect()
    # unknown tensor name is loud at planning
    with pytest.raises(Exception, match="no tensor named"):
        read_safetensors(spark, str(tmp_path), "nope").collect()


def test_meta_distributed(spark, tmp_path):
    _write_basic(tmp_path / "m0.safetensors", n=20, d=4)
    _write_basic(tmp_path / "m1.safetensors", n=10, d=4)
    meta = safetensors_meta(spark, str(tmp_path)).collect()
    got = {(r.file.rsplit("/", 1)[-1], r.tensor): (list(r.shape), r.nbytes)
           for r in meta}
    assert got[("m0.safetensors", "emb")] == ([20, 4], 320)
    assert got[("m1.safetensors", "ids")] == ([10, 1], 80)


def test_index_audit_statuses(spark, tmp_path):
    import json

    from h2h_spark.sources.safetensors import safetensors_index_audit

    write_safetensors(str(tmp_path / "model-1.safetensors"), {
        "a.weight": np.zeros((2, 2), dtype="<f4"),
        "b.weight": np.ones((1, 4), dtype="<f4"),
        "stray.weight": np.zeros((1, 1), dtype="<f4"),
    })
    write_safetensors(str(tmp_path / "model-2.safetensors"), {
        "c.weight": np.zeros((3, 2), dtype="<f4"),
    })
    idx = {
        "metadata": {"total_size": 9999},
        "weight_map": {
            "a.weight": "model-1.safetensors",
            "b.weight": "model-1.safetensors",
            "c.weight": "model-1.safetensors",   # actually in model-2
            "ghost.weight": "model-2.safetensors",  # nowhere
        },
    }
    (tmp_path / "model.safetensors.index.json").write_text(
        json.dumps(idx)
    )
    rows = safetensors_index_audit(spark, str(tmp_path)).collect()
    st = {r.tensor: r.status for r in rows}
    assert st == {
        "a.weight": "ok",
        "b.weight": "ok",
        "c.weight": "wrong_shard",
        "ghost.weight": "missing_from_shard",
        "stray.weight": "not_in_index",
    }
    assert all(r.declared_total_size == 9999 for r in rows)
    # missing index file is loud
    import pytest as _pytest

    with _pytest.raises(ValueError, match="index"):
        safetensors_index_audit(spark, str(tmp_path), "nope.json")


def test_bf16_roundtrip_widening(spark, tmp_path):
    from h2h_spark.sources.safetensors import bf16_to_f32, f32_to_bf16_bytes

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((24, 4)).astype("<f4")
    p = tmp_path / "bf.safetensors"
    write_safetensors(str(p), {"w": mat}, bf16=("w",))
    header, _ = read_header(str(p))
    assert header["w"]["dtype"] == "BF16"
    assert header["w"]["data_offsets"] == [0, 24 * 4 * 2]
    # expected: RNE-rounded bf16 widened back — exact by construction
    expected = bf16_to_f32(
        np.frombuffer(f32_to_bf16_bytes(mat), dtype="<u2")
    ).reshape(24, 4)
    df = read_safetensors(spark, str(tmp_path), "w", rows_per_split=10)
    assert df.schema["vec"].dataType.simpleString() == "array<float>"
    rows = {r.row_idx: r.vec for r in df.collect()}
    got = np.array([rows[i] for i in range(24)], dtype="<f4")
    assert (got == expected).all()
    # bf16 really is the top half of f32: max error bounded by 1 ulp
    # of an 8-bit mantissa
    assert np.abs(got - mat).max() <= np.abs(mat).max() * 2 ** -8


def test_missing_tensor_skip_mode(spark, tmp_path):
    # tensor-per-shard layout (the HF sharded-checkpoint shape)
    write_safetensors(str(tmp_path / "s1.safetensors"),
                      {"a": np.zeros((4, 2), dtype="<f4")})
    write_safetensors(str(tmp_path / "s2.safetensors"),
                      {"b": np.ones((3, 2), dtype="<f4")})
    # default: loud on the shard that lacks the tensor
    with pytest.raises(Exception, match="no tensor named"):
        read_safetensors(spark, str(tmp_path), "a").collect()
    # skip mode: reads only the shard that holds it
    rows = read_safetensors(
        spark, str(tmp_path), "b", missing_tensor="skip"
    ).collect()
    assert len(rows) == 3 and rows[0].vec == [1.0, 1.0]
    # still loud when NO shard holds the tensor
    with pytest.raises(Exception, match="hold tensor|holds tensor"):
        read_safetensors(
            spark, str(tmp_path), "zz", missing_tensor="skip"
        ).collect()
