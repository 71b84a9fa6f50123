"""Round-12 additions: GGUF K-quant (Q4_K/Q6_K) and legacy-quant
(Q4_1/Q5_0/Q5_1, F16/BF16) dequantization, plan-time loudness in
read_gguf_rows, and the large-dictionary-frame resync fix in gzscan
(regression test lives in test_zst_dict.py).

The K-quant checks decode the WIRE bytes with an independent scalar
loop transliterated from the public ggml spec (llama.cpp
ggml-quants.c dequantize_row_q6_K / dequantize_row_q4_K), so a
consistent round-trip bug in pack+dequant cannot hide."""

import struct

import numpy as np
import pytest

from h2h_spark.sources.gguf import (
    dequant_rows,
    pack_q4k,
    pack_q6k,
    read_gguf_rows,
    write_gguf,
)


def _scalar_q6k(raw: bytes, nb: int) -> np.ndarray:
    """Reference Q6_K decode: byte-faithful scalar walk."""
    out = np.zeros((nb, 256), "f4")
    for i in range(nb):
        b = raw[i * 210:(i + 1) * 210]
        ql, qh = b[0:128], b[128:192]
        s = np.frombuffer(b[192:208], "i1")
        d = float(np.frombuffer(b[208:210], "<f2")[0])
        y = np.zeros(256, "f4")
        yo = qlo = qho = so = 0
        for _half in range(2):
            for l in range(32):
                isx = l // 16
                q1 = ((ql[qlo + l] & 0xF)
                      | (((qh[qho + l] >> 0) & 3) << 4)) - 32
                q2 = ((ql[qlo + l + 32] & 0xF)
                      | (((qh[qho + l] >> 2) & 3) << 4)) - 32
                q3 = ((ql[qlo + l] >> 4)
                      | (((qh[qho + l] >> 4) & 3) << 4)) - 32
                q4 = ((ql[qlo + l + 32] >> 4)
                      | (((qh[qho + l] >> 6) & 3) << 4)) - 32
                y[yo + l] = d * s[so + isx + 0] * q1
                y[yo + l + 32] = d * s[so + isx + 2] * q2
                y[yo + l + 64] = d * s[so + isx + 4] * q3
                y[yo + l + 96] = d * s[so + isx + 6] * q4
            yo += 128
            qlo += 64
            qho += 32
            so += 8
        out[i] = y
    return out


def _scalar_q4k(raw: bytes, nb: int) -> np.ndarray:
    """Reference Q4_K decode incl. get_scale_min_k4's packed 6-bit
    scale/min extraction."""
    out = np.zeros((nb, 256), "f4")
    for i in range(nb):
        b = raw[i * 144:(i + 1) * 144]
        d = float(np.frombuffer(b[0:2], "<f2")[0])
        dmin = float(np.frombuffer(b[2:4], "<f2")[0])
        s, q = b[4:16], b[16:144]

        def gsm(j):
            if j < 4:
                return s[j] & 63, s[j + 4] & 63
            return ((s[j + 4] & 0xF) | ((s[j - 4] >> 6) << 4),
                    (s[j + 4] >> 4) | ((s[j] >> 6) << 4))

        y = []
        qo = isx = 0
        for _grp in range(4):
            sc1, m1 = gsm(isx)
            sc2, m2 = gsm(isx + 1)
            for l in range(32):
                y.append(d * sc1 * (q[qo + l] & 0xF) - dmin * m1)
            for l in range(32):
                y.append(d * sc2 * (q[qo + l] >> 4) - dmin * m2)
            qo += 32
            isx += 2
        out[i] = np.array(y, "f4")
    return out


def test_q6k_pack_dequant_vs_scalar_reference():
    rng = np.random.RandomState(7)
    nb = 5
    d = 2.0 ** -rng.randint(0, 4, nb)
    sc = rng.randint(-20, 21, (nb, 16))
    codes = rng.randint(0, 64, (nb, 256))
    raw = pack_q6k(d, sc, codes)
    assert len(raw) == nb * 210
    x = dequant_rows("Q6_K", raw, nb, 256)
    assert np.array_equal(x, _scalar_q6k(raw, nb))
    # multi-superblock rows reshape correctly: 1 row x 1280 cols
    x_wide = dequant_rows("Q6_K", raw, 1, nb * 256)
    assert np.array_equal(x_wide.reshape(nb, 256), x)


def test_q4k_pack_dequant_vs_scalar_reference():
    rng = np.random.RandomState(11)
    nb = 5
    d = 2.0 ** -rng.randint(0, 3, nb)
    dm = 2.0 ** -rng.randint(0, 3, nb)
    sc = rng.randint(0, 64, (nb, 8))
    mn = rng.randint(0, 64, (nb, 8))
    codes = rng.randint(0, 16, (nb, 256))
    raw = pack_q4k(d, dm, sc, mn, codes)
    assert len(raw) == nb * 144
    x = dequant_rows("Q4_K", raw, nb, 256)
    assert np.array_equal(x, _scalar_q4k(raw, nb))


def test_kquant_pack_validates_ranges():
    with pytest.raises(ValueError, match="6-bit"):
        pack_q4k([1.0], [1.0], [[64] * 8], [[0] * 8], [[0] * 256])
    with pytest.raises(ValueError, match="nibbles"):
        pack_q4k([1.0], [1.0], [[0] * 8], [[0] * 8], [[16] * 256])
    with pytest.raises(ValueError, match="6-bit"):
        pack_q6k([1.0], [[0] * 16], [[64] * 256])


def test_legacy_quant_wire_decode():
    rng = np.random.RandomState(3)
    codes = rng.randint(0, 16, 32)
    qs = bytes((codes[:16] | (codes[16:] << 4)).astype("u1"))
    # Q4_1: x = d*n + m
    raw = (np.float16(0.25).tobytes() + np.float16(3.0).tobytes() + qs)
    x = dequant_rows("Q4_1", raw, 1, 32)[0]
    assert np.array_equal(x, (0.25 * codes + 3.0).astype("f4"))
    # Q5_0 / Q5_1: elem j's 5th bit is qh bit j
    c5 = rng.randint(0, 32, 32)
    qh = 0
    for j in range(32):
        qh |= ((int(c5[j]) >> 4) & 1) << j
    qs5 = bytes(((c5[:16] & 0xF) | ((c5[16:] & 0xF) << 4)).astype("u1"))
    raw = np.float16(0.5).tobytes() + struct.pack("<I", qh) + qs5
    x = dequant_rows("Q5_0", raw, 1, 32)[0]
    assert np.array_equal(x, (0.5 * (c5 - 16)).astype("f4"))
    raw = (np.float16(0.5).tobytes() + np.float16(-2.0).tobytes()
           + struct.pack("<I", qh) + qs5)
    x = dequant_rows("Q5_1", raw, 1, 32)[0]
    assert np.array_equal(x, (0.5 * c5 - 2.0).astype("f4"))


def test_float16_paths():
    f16 = np.arange(12, dtype="<f2")
    assert np.array_equal(
        dequant_rows("F16", f16.tobytes(), 3, 4),
        f16.astype("f4").reshape(3, 4),
    )
    bf = np.array([0x3F80, 0x4000, 0xC000, 0x0000], "<u2")
    assert np.array_equal(
        dequant_rows("BF16", bf.tobytes(), 1, 4),
        np.array([[1.0, 2.0, -2.0, 0.0]], "f4"),
    )


def test_orc_lzo_footer_decode_real_writer(spark, tmp_work):
    """The from-spec LZO1X decoder (`sources/lzo1x.py`) must read ORC
    footers produced by a REAL independent encoder — Spark's Java ORC
    writer (aircompressor LZO)."""
    import glob

    from h2h_spark.sources.meta import parse_orc_meta

    df = spark.range(5000).selectExpr(
        "id AS key", "repeat('abc', CAST(id % 7 AS INT)) AS s"
    )
    out = f"{tmp_work}/lzo_orc"
    df.coalesce(1).write.mode("overwrite").option(
        "compression", "lzo"
    ).orc(out)
    p = glob.glob(f"{out}/*.orc")[0]
    m = parse_orc_meta(p)
    assert m["codec"] == "LZO"
    assert m["n_rows"] == 5000
    assert sum(s["n_rows"] for s in m["stripes"]) == 5000


def test_fuzzy_join_max_block_guard(spark):
    from h2h_spark.operators.text import fuzzy_join

    rows = [(i, f"w{i:03d} inc") for i in range(40)]  # hot key "inc"
    rows += [(100, "alpha corp"), (101, "betas corp")]
    left = spark.createDataFrame(rows, "id int, name string")
    right = spark.createDataFrame(
        [(200, "alphq corp"), (201, "w001 inc")], "id int, name string"
    )
    # guard off: the hot block matches too ("w001 inc" is within one
    # edit of 13 of the "wXYZ inc" names, plus alpha~alphq)
    full = fuzzy_join(left, right, "name", "name", max_block=None)
    assert full.count() == 14
    # guard on with a cap below the hot block: "inc" block excluded on
    # either side's count, the well-blocked match survives; columns are
    # left(id, name) + right(id, name) + edit_dist.  Exclusion is never
    # silent (ADVICE r12): a UserWarning names the excluded key(s).
    import warnings as _w

    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        guarded = fuzzy_join(left, right, "name", "name", max_block=10)
    msgs = [str(c.message) for c in caught
            if issubclass(c.category, UserWarning)]
    assert any("'inc'" in m and "max_block=10" in m for m in msgs), msgs
    rows = guarded.collect()
    assert [tuple(r) for r in rows] == [
        (100, "alpha corp", 200, "alphq corp", 1)
    ]
    # no hot keys -> no warning, plan identical to the unguarded one
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        quiet = fuzzy_join(left, right, "name", "name", max_block=100)
    assert not [c for c in caught if issubclass(c.category, UserWarning)]
    assert quiet.count() == 14


def test_read_gguf_rows_plan_time_loudness(spark, tmp_work):
    # unsupported dtype rejected at PLAN time (F64 has no dequant)
    n, cols = 4, 256
    raw6 = pack_q6k(
        np.ones(n), np.ones((n, 16)), np.zeros((n, 256))
    )
    p = f"{tmp_work}/k.gguf"
    write_gguf(p, {}, {"w6": (14, [cols, n], raw6)})
    df = read_gguf_rows(spark, p, "w6", rows_per_split=3)
    assert df.count() == n
    # a K-quant tensor whose row length is not a super-block multiple
    raw_half = pack_q6k(np.ones(2), np.ones((2, 16)), np.zeros((2, 256)))
    write_gguf(f"{tmp_work}/mis.gguf", {},
               {"w": (14, [128, 4], raw_half)})
    with pytest.raises(ValueError, match="multiple of the 256-element"):
        read_gguf_rows(spark, f"{tmp_work}/mis.gguf", "w")
    # duplicate tensor names are loud, not an unpack crash
    import h2h_spark.sources.gguf as gguf_mod

    meta = gguf_mod.parse_gguf_meta(p)
    dup = dict(meta)
    dup["tensors"] = meta["tensors"] + meta["tensors"]
    orig = gguf_mod.parse_gguf_meta
    gguf_mod.parse_gguf_meta = lambda _p: dup
    try:
        with pytest.raises(ValueError, match="2 tensors named"):
            read_gguf_rows(spark, p, "w6")
    finally:
        gguf_mod.parse_gguf_meta = orig
