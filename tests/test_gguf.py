"""GGUF metadata walk: header parse, KV types, alignment validation,
loud failure modes."""

import struct

import numpy as np
import pytest

from h2h_spark.sources.gguf import gguf_meta, parse_gguf_meta, write_gguf


def _write_model(path, name="tiny", v=100, d=8):
    write_gguf(str(path), {
        "general.architecture": "llama",
        "general.name": name,
        "llama.embedding_length": d,
        "rope.freq_base": 10000.0,
        "tokenizer.add_bos": True,
    }, {
        "tok_embd.weight": np.zeros((v, d), dtype="<f4"),
        "output_norm.weight": np.ones((d,), dtype="<f4"),
    })


def test_roundtrip_kv_and_tensors(tmp_path):
    p = tmp_path / "m.gguf"
    _write_model(p, v=65, d=12)
    m = parse_gguf_meta(str(p))
    assert m["version"] == 3 and m["alignment"] == 32
    assert m["kv"]["general.architecture"] == "llama"
    assert m["kv"]["llama.embedding_length"] == 12
    assert m["kv"]["tokenizer.add_bos"] is True
    assert abs(m["kv"]["rope.freq_base"] - 10000.0) < 1e-3
    t0, t1 = m["tensors"]
    assert t0["dims"] == [12, 65]  # ggml order: fastest-varying first
    assert t0["n_elems"] == 780 and t0["nbytes"] == 3120
    assert t1["offset"] == (3120 + 31) // 32 * 32
    # data really starts aligned and holds the norm tensor's ones
    with open(p, "rb") as f:
        f.seek(m["data_start"] + t1["offset"])
        ones = np.frombuffer(f.read(48), dtype="<f4")
    assert (ones == 1.0).all()


def test_loud_failures(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"GGML" + b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        parse_gguf_meta(str(p))
    p.write_bytes(b"GGUF" + struct.pack("<I", 9) + b"\x00" * 64)
    with pytest.raises(ValueError, match="version"):
        parse_gguf_meta(str(p))
    # implausible counts
    p.write_bytes(b"GGUF" + struct.pack("<IQQ", 3, 1 << 40, 0))
    with pytest.raises(ValueError, match="implausible"):
        parse_gguf_meta(str(p))
    # truncated mid-kv
    good = tmp_path / "g.gguf"
    _write_model(good)
    p.write_bytes(good.read_bytes()[:40])
    with pytest.raises(ValueError, match="truncated"):
        parse_gguf_meta(str(p))
    # misaligned tensor offset: patch the F32 type+offset of tensor 0
    raw = bytearray(good.read_bytes())
    i = raw.index(b"tok_embd.weight") + len(b"tok_embd.weight")
    # layout after name: n_dims u32, dims u64*2, type u32, offset u64
    off_pos = i + 4 + 16 + 4
    raw[off_pos:off_pos + 8] = struct.pack("<Q", 7)
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="alignment"):
        parse_gguf_meta(str(p))


def test_gguf_meta_distributed(spark, tmp_path):
    _write_model(tmp_path / "a.gguf", name="a", v=64, d=8)
    _write_model(tmp_path / "b.gguf", name="b", v=32, d=16)
    rows = gguf_meta(spark, str(tmp_path)).collect()
    assert len(rows) == 4
    got = {(r.model_name, r.tensor): (r.n_elems, r.nbytes, list(r.dims))
           for r in rows}
    assert got[("a", "tok_embd.weight")] == (512, 2048, [8, 64])
    assert got[("b", "output_norm.weight")] == (16, 64, [16])
    assert all(r.architecture == "llama" and r.n_kv == 5 for r in rows)


def test_dequant_quantize_roundtrip_exact():
    import numpy as np

    from h2h_spark.sources.gguf import dequant_rows, quantize_rows

    d = np.array([0.5, 0.25, 1.0, 0.125], "<f2")
    q = (np.arange(128).reshape(4, 32) % 255) - 64
    x8 = dequant_rows("Q8_0", quantize_rows("Q8_0", d, q), 2, 64)
    exp = (d.astype("f4")[:, None] * q.astype("f4")).reshape(2, 64)
    assert (x8 == exp).all()
    n = np.arange(128).reshape(4, 32) % 16
    x4 = dequant_rows("Q4_0", quantize_rows("Q4_0", d, n), 4, 32)
    exp4 = d.astype("f4")[:, None] * (n.astype("f4") - 8)
    assert (x4 == exp4).all()
    # nibble halves must not be swapped: elem j lives in the LOW nibble
    raw = quantize_rows("Q4_0", d[:1], np.arange(32)[None, :] % 16)
    assert raw[2] & 0x0F == 0 and raw[2] >> 4 == 0  # j=0 lo, j=16 hi... 
    assert (raw[2 + 5] & 0x0F) == 5


def test_dequant_loud_paths():
    import pytest

    from h2h_spark.sources.gguf import dequant_rows

    # Q8_1 remains outside the dequant set (round 13 closed all the
    # K-quants, so the loud-path probe moved off Q3_K)
    with pytest.raises(ValueError, match="not implemented"):
        dequant_rows("Q8_1", b"", 1, 256)
    with pytest.raises(ValueError, match="bytes"):
        dequant_rows("Q3_K", b"", 1, 256)
    with pytest.raises(ValueError, match="multiple"):
        dequant_rows("Q8_0", b"", 1, 33)
    with pytest.raises(ValueError, match="256-element super-block"):
        dequant_rows("Q6_K", b"", 1, 32)
    with pytest.raises(ValueError, match="bytes"):
        dequant_rows("Q8_0", b"\x00" * 10, 1, 32)


def test_read_gguf_rows_distributed(spark, tmp_work):
    import numpy as np
    import pytest

    from h2h_spark.sources.gguf import (
        quantize_rows,
        read_gguf_rows,
        write_gguf,
    )

    n, cols = 100, 32
    d = (2.0 ** -(np.arange(n) % 4)).astype("<f2")
    q = (np.arange(n * cols).reshape(n, cols) % 200) - 100
    raw = quantize_rows("Q8_0", d, q)
    p = f"{tmp_work}/m.gguf"
    write_gguf(p, {"general.architecture": "t"},
               {"w": (8, [cols, n], raw),
                "f": np.arange(12, dtype="<f4").reshape(3, 4)})
    df = read_gguf_rows(spark, p, "w", rows_per_split=7)
    got = {r.row_idx: list(r.vec) for r in df.collect()}
    assert len(got) == n
    exp = d.astype("f4")[:, None] * q.astype("f4")
    assert got[0] == list(exp[0]) and got[99] == list(exp[99])
    # F32 tensors read through the same path
    f32 = {r.row_idx: list(r.vec) for r in
           read_gguf_rows(spark, p, "f").collect()}
    assert f32[2] == [8.0, 9.0, 10.0, 11.0]
    # loud: unknown tensor, 1-D tensor rejected
    with pytest.raises(ValueError, match="no tensor named"):
        read_gguf_rows(spark, p, "missing")
    write_gguf(f"{tmp_work}/one.gguf", {},
               {"v": np.arange(4, dtype="<f4")})
    with pytest.raises(ValueError, match="2-D"):
        read_gguf_rows(spark, f"{tmp_work}/one.gguf", "v")
