"""GGUF model-file metadata walk — the single-file LLM weight format of
the ggml ecosystem (public spec: ggml-org/ggml ``docs/gguf.md``:
``GGUF`` magic, version 3, u64 tensor/kv counts, length-prefixed
string KV pairs, tensor infos ``(name, n_dims, dims, ggml_type,
offset)``, tensor data aligned to ``general.alignment``, default 32).

The inventory step of a model-fleet pipeline: architecture, parameter
count, quantization mix, tensor shapes — from HEADER reads only (the
tensor data, which is ~all of the file, is never touched).  That is
the parquet-footer discipline applied to model artifacts: a directory
of N-GB checkpoints inventories with KiB-sized reads per file.

Loud failures: wrong magic, unsupported versions, unknown value types,
tensor offsets that violate the declared alignment, nbytes for
quantization types outside the implemented set (F32/F16/Q8_0/Q4_0 —
anything else reports its type NAME but raises on byte math rather
than guessing block layouts).
"""

from __future__ import annotations

import struct
from typing import BinaryIO

from pyspark.sql import DataFrame, SparkSession

from h2h_spark.sources.util import list_part_files, strip_scheme

_MAGIC = b"GGUF"

# value type id → (struct fmt, size) for scalars
_SCALARS = {
    0: ("<B", 1), 1: ("<b", 1), 2: ("<H", 2), 3: ("<h", 2),
    4: ("<I", 4), 5: ("<i", 4), 6: ("<f", 4), 7: ("<?", 1),
    10: ("<Q", 8), 11: ("<q", 8), 12: ("<d", 8),
}
_T_STRING = 8
_T_ARRAY = 9

# ggml type id → (name, block_elems, block_bytes); byte math only for
# the implemented subset, names for the full common range
_GGML_TYPES = {
    0: ("F32", 1, 4),
    1: ("F16", 1, 2),
    2: ("Q4_0", 32, 18),
    3: ("Q4_1", 32, 20),
    6: ("Q5_0", 32, 22),
    7: ("Q5_1", 32, 24),
    8: ("Q8_0", 32, 34),
    # K-quants: 256-element super-blocks (llama.cpp ggml-quants.h)
    10: ("Q2_K", 256, 84),
    11: ("Q3_K", 256, 110),
    12: ("Q4_K", 256, 144),
    13: ("Q5_K", 256, 176),
    14: ("Q6_K", 256, 210),
    15: ("Q8_K", 256, 292),
    # known names without byte math (block layouts not implemented)
    9: ("Q8_1", None, None),
    24: ("I8", None, None), 25: ("I16", None, None),
    26: ("I32", None, None), 27: ("I64", None, None),
    28: ("F64", None, None), 30: ("BF16", 1, 2),
}

# types dequant_rows can decode — read_gguf_rows rejects anything else
# at PLAN time (where type_name is already known), not inside tasks
_DEQUANT_TYPES = frozenset({
    "F32", "F16", "BF16",
    "Q8_0", "Q4_0", "Q4_1", "Q5_0", "Q5_1",
    "Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K", "Q8_K",
})


def _read_exact(f: BinaryIO, n: int, what: str) -> bytes:
    b = f.read(n)
    if len(b) < n:
        raise ValueError(f"truncated GGUF file while reading {what}")
    return b


def _read_str(f: BinaryIO) -> str:
    (n,) = struct.unpack("<Q", _read_exact(f, 8, "string length"))
    if n > 1 << 20:
        raise ValueError(f"GGUF string length {n} exceeds 1 MiB sanity bound")
    return _read_exact(f, n, "string body").decode("utf-8")


def _read_value(f: BinaryIO, vtype: int):
    if vtype in _SCALARS:
        fmt, size = _SCALARS[vtype]
        return struct.unpack(fmt, _read_exact(f, size, "scalar value"))[0]
    if vtype == _T_STRING:
        return _read_str(f)
    if vtype == _T_ARRAY:
        (etype,) = struct.unpack("<I", _read_exact(f, 4, "array elem type"))
        (count,) = struct.unpack("<Q", _read_exact(f, 8, "array count"))
        if count > 1 << 24:
            raise ValueError(f"GGUF array count {count} exceeds sanity bound")
        return [_read_value(f, etype) for _ in range(count)]
    raise ValueError(f"unknown GGUF value type {vtype}")


def parse_gguf_meta(path: str) -> dict:
    """Header-only walk of one GGUF file: returns ``{version, kv:
    {key: value}, tensors: [{name, dims, type_id, type_name, n_elems,
    nbytes, offset}], alignment, data_start}``.  ``nbytes`` is None for
    quantization types outside the implemented byte-math subset."""
    with open(strip_scheme(path), "rb") as f:
        if _read_exact(f, 4, "magic") != _MAGIC:
            raise ValueError(f"{path}: not a GGUF file (magic missing)")
        (version,) = struct.unpack("<I", _read_exact(f, 4, "version"))
        if version not in (2, 3):
            raise ValueError(f"{path}: unsupported GGUF version {version}")
        n_tensors, n_kv = struct.unpack(
            "<QQ", _read_exact(f, 16, "counts")
        )
        if n_tensors > 1 << 20 or n_kv > 1 << 20:
            raise ValueError(f"{path}: implausible GGUF counts "
                             f"({n_tensors} tensors, {n_kv} kv)")
        kv: dict = {}
        for _ in range(n_kv):
            key = _read_str(f)
            (vtype,) = struct.unpack("<I", _read_exact(f, 4, "value type"))
            kv[key] = _read_value(f, vtype)
        tensors = []
        for _ in range(n_tensors):
            name = _read_str(f)
            (n_dims,) = struct.unpack("<I", _read_exact(f, 4, "n_dims"))
            if n_dims > 8:
                raise ValueError(f"{path}: tensor {name!r} claims "
                                 f"{n_dims} dims")
            dims = list(struct.unpack(
                f"<{n_dims}Q", _read_exact(f, 8 * n_dims, "dims")
            ))
            type_id, = struct.unpack("<I", _read_exact(f, 4, "ggml type"))
            offset, = struct.unpack("<Q", _read_exact(f, 8, "offset"))
            info = _GGML_TYPES.get(type_id)
            n_elems = 1
            for d in dims:
                n_elems *= d
            nbytes = None
            if info and info[1]:
                _, block_e, block_b = info
                if n_elems % block_e:
                    raise ValueError(
                        f"{path}: tensor {name!r} has {n_elems} elements, "
                        f"not a multiple of {info[0]}'s block size {block_e}"
                    )
                nbytes = n_elems // block_e * block_b
            tensors.append({
                "name": name, "dims": dims, "type_id": type_id,
                "type_name": info[0] if info else f"UNKNOWN({type_id})",
                "n_elems": n_elems, "nbytes": nbytes, "offset": offset,
            })
        header_end = f.tell()
    alignment = int(kv.get("general.alignment", 32))
    if alignment <= 0 or alignment & (alignment - 1):
        raise ValueError(f"{path}: general.alignment {alignment} is not a "
                         "power of two")
    for t in tensors:
        if t["offset"] % alignment:
            raise ValueError(
                f"{path}: tensor {t['name']!r} offset {t['offset']} "
                f"violates alignment {alignment}"
            )
    data_start = (header_end + alignment - 1) // alignment * alignment
    return {
        "version": version, "kv": kv, "tensors": tensors,
        "alignment": alignment, "data_start": data_start,
    }


def write_gguf(path: str, kv: dict, tensors: dict) -> None:
    """Fixture/interop writer: GGUF v3 with string/int/float KV values
    and tensors given either as F32 numpy arrays or as pre-encoded
    ``(ggml_type_id, dims_ggml_order, raw_bytes)`` tuples (quantized
    fixtures), 32-byte aligned tensor data.  Note GGUF stores dims in
    ggml order (fastest-varying first) — for numpy arrays this writer
    stores ``arr.shape`` reversed, matching llama.cpp exporters."""
    import io

    import numpy as np

    buf = io.BytesIO()

    def w_str(s: str) -> None:
        b = s.encode("utf-8")
        buf.write(struct.pack("<Q", len(b)) + b)

    buf.write(_MAGIC)
    buf.write(struct.pack("<I", 3))
    buf.write(struct.pack("<QQ", len(tensors), len(kv)))
    for key, val in kv.items():
        w_str(key)
        if isinstance(val, bool):
            buf.write(struct.pack("<I?", 7, val))
        elif isinstance(val, int):
            buf.write(struct.pack("<Iq", 11, val))
        elif isinstance(val, float):
            buf.write(struct.pack("<If", 6, val))
        elif isinstance(val, str):
            buf.write(struct.pack("<I", _T_STRING))
            w_str(val)
        else:
            raise ValueError(f"kv {key!r}: unsupported value {type(val)}")
    blobs = []
    off = 0
    for name, arr in tensors.items():
        w_str(name)
        if isinstance(arr, tuple):
            # pre-encoded tensor: (ggml_type_id, dims_ggml_order, raw)
            type_id, dims, raw = arr
            _, belems, bbytes = _GGML_TYPES[type_id]
            n_elems = 1
            for d in dims:
                n_elems *= d
            if belems is None or n_elems % belems or \
                    len(raw) != n_elems // belems * bbytes:
                raise ValueError(
                    f"tensor {name!r}: raw size {len(raw)} does not "
                    f"match {n_elems} elems of type id {type_id}"
                )
        else:
            arr = np.ascontiguousarray(arr, dtype="<f4")
            type_id = 0  # F32
            dims = list(arr.shape)[::-1]  # ggml order
            raw = arr.tobytes()
        buf.write(struct.pack("<I", len(dims)))
        buf.write(struct.pack(f"<{len(dims)}Q", *dims))
        buf.write(struct.pack("<IQ", type_id, off))
        blobs.append(raw)
        off += (len(raw) + 31) // 32 * 32
    pad = (-buf.tell()) % 32
    buf.write(b"\x00" * pad)
    for raw in blobs:
        buf.write(raw)
        buf.write(b"\x00" * ((-len(raw)) % 32))
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def gguf_meta(spark: SparkSession, path: str) -> DataFrame:
    """One row per tensor per ``.gguf`` file under ``path``: ``(file,
    architecture, model_name, n_kv, n_tensors, tensor, type_name, dims,
    n_elems, nbytes, offset)``.  Header-only reads, one task per file
    batch."""
    files = sorted(list_part_files(path, pattern="*.gguf"))
    if not files:
        raise ValueError(f"no .gguf files under {path}")
    fdf = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(min(len(files), 64))

    def _run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                m = parse_gguf_meta(f)
                arch = str(m["kv"].get("general.architecture", ""))
                name = str(m["kv"].get("general.name", ""))
                for t in m["tensors"]:
                    rows.append((
                        f, arch, name, len(m["kv"]), len(m["tensors"]),
                        t["name"], t["type_name"], t["dims"],
                        t["n_elems"], t["nbytes"], t["offset"],
                    ))
            yield pd.DataFrame(rows, columns=[
                "file", "architecture", "model_name", "n_kv", "n_tensors",
                "tensor", "type_name", "dims", "n_elems", "nbytes",
                "offset",
            ])

    return fdf.mapInPandas(
        _run,
        "file string, architecture string, model_name string, "
        "n_kv bigint, n_tensors bigint, tensor string, type_name string, "
        "dims array<bigint>, n_elems bigint, nbytes bigint, offset bigint",
    )


# ---------------------------------------------------------------------------
# quantized tensor DATA: dequantization + distributed row reads (round 11)
# ---------------------------------------------------------------------------
#
# Block layouts are the llama.cpp/ggml wire formats (public spec,
# ggml-org/ggml docs + ggml-quants.c layout comments):
#   Q8_0: per 32 elems — f16 scale d, 32 x int8 q;        x = d * q
#   Q4_0: per 32 elems — f16 scale d, 16 bytes of nibbles; byte j holds
#         elem j in the LOW nibble and elem j+16 in the HIGH nibble,
#         each nibble n in [0,15] decoding to (n - 8);     x = d * (n-8)
#
# Dequant is numpy-vectorized over whole row ranges (structured-array
# views; no per-element Python).  Reads are BYTE-RANGE row strides off
# the header-planned tensor offset — the same scan discipline as the
# safetensors source: plan from a KiB header, fan out disjoint ranges.


def dequant_rows(type_name: str, raw: bytes, n_rows: int, n_cols: int):
    """Decode ``n_rows`` x ``n_cols`` elements of row data from ``raw``
    into a float32 ndarray.  Supported: the :data:`_DEQUANT_TYPES` set
    (floats, the 32-element legacy quants, and the Q4_K/Q6_K 256-element
    super-block K-quants).  Loud on any other type or a size mismatch —
    never guesses a block layout."""
    import numpy as np

    if n_cols % 32 and type_name in ("Q8_0", "Q4_0", "Q4_1",
                                     "Q5_0", "Q5_1"):
        raise ValueError(
            f"{type_name}: row length {n_cols} not a multiple of the "
            "32-element block"
        )
    if n_cols % 256 and type_name in ("Q2_K", "Q3_K", "Q4_K",
                                      "Q5_K", "Q6_K", "Q8_K"):
        raise ValueError(
            f"{type_name}: row length {n_cols} not a multiple of the "
            "256-element super-block"
        )
    if type_name == "F32":
        want = n_rows * n_cols * 4
        if len(raw) != want:
            raise ValueError(f"F32: got {len(raw)} bytes, want {want}")
        return np.frombuffer(raw, "<f4").reshape(n_rows, n_cols)
    if type_name == "Q8_0":
        dt = np.dtype([("d", "<f2"), ("q", "i1", (32,))])
        want = n_rows * (n_cols // 32) * dt.itemsize
        if len(raw) != want:
            raise ValueError(f"Q8_0: got {len(raw)} bytes, want {want}")
        blocks = np.frombuffer(raw, dt)
        x = blocks["d"].astype("<f4")[:, None] * blocks["q"].astype("<f4")
        return x.reshape(n_rows, n_cols)
    if type_name == "Q4_0":
        dt = np.dtype([("d", "<f2"), ("qs", "u1", (16,))])
        want = n_rows * (n_cols // 32) * dt.itemsize
        if len(raw) != want:
            raise ValueError(f"Q4_0: got {len(raw)} bytes, want {want}")
        blocks = np.frombuffer(raw, dt)
        lo = (blocks["qs"] & 0x0F).astype("<i1") - 8
        hi = (blocks["qs"] >> 4).astype("<i1") - 8
        elems = np.concatenate([lo, hi], axis=1).astype("<f4")
        x = blocks["d"].astype("<f4")[:, None] * elems
        return x.reshape(n_rows, n_cols)
    if type_name == "F16":
        want = n_rows * n_cols * 2
        if len(raw) != want:
            raise ValueError(f"F16: got {len(raw)} bytes, want {want}")
        return np.frombuffer(raw, "<f2").astype("<f4").reshape(
            n_rows, n_cols
        )
    if type_name == "BF16":
        want = n_rows * n_cols * 2
        if len(raw) != want:
            raise ValueError(f"BF16: got {len(raw)} bytes, want {want}")
        u = np.frombuffer(raw, "<u2").astype("<u4") << 16
        return u.view("<f4").reshape(n_rows, n_cols)
    if type_name == "Q4_1":
        # per 32 elems: f16 d, f16 m, 16 nibble bytes; x = d*n + m
        dt = np.dtype([("d", "<f2"), ("m", "<f2"), ("qs", "u1", (16,))])
        want = n_rows * (n_cols // 32) * dt.itemsize
        if len(raw) != want:
            raise ValueError(f"Q4_1: got {len(raw)} bytes, want {want}")
        blocks = np.frombuffer(raw, dt)
        lo = blocks["qs"] & 0x0F
        hi = blocks["qs"] >> 4
        elems = np.concatenate([lo, hi], axis=1).astype("<f4")
        x = (blocks["d"].astype("<f4")[:, None] * elems
             + blocks["m"].astype("<f4")[:, None])
        return x.reshape(n_rows, n_cols)
    if type_name in ("Q5_0", "Q5_1"):
        # per 32 elems: f16 d (+ f16 m for Q5_1), u32 of high bits,
        # 16 nibble bytes; elem j's 5th bit is qh bit j
        if type_name == "Q5_0":
            dt = np.dtype([("d", "<f2"), ("qh", "<u4"),
                           ("qs", "u1", (16,))])
        else:
            dt = np.dtype([("d", "<f2"), ("m", "<f2"), ("qh", "<u4"),
                           ("qs", "u1", (16,))])
        want = n_rows * (n_cols // 32) * dt.itemsize
        if len(raw) != want:
            raise ValueError(
                f"{type_name}: got {len(raw)} bytes, want {want}"
            )
        blocks = np.frombuffer(raw, dt)
        j = np.arange(16)
        qh = blocks["qh"][:, None]
        lo = (blocks["qs"] & 0x0F) | (((qh >> j) & 1) << 4).astype("u1")
        hi = (blocks["qs"] >> 4) | (((qh >> (j + 16)) & 1) << 4).astype(
            "u1"
        )
        elems = np.concatenate([lo, hi], axis=1).astype("<f4")
        d = blocks["d"].astype("<f4")[:, None]
        if type_name == "Q5_0":
            x = d * (elems - 16.0)
        else:
            x = d * elems + blocks["m"].astype("<f4")[:, None]
        return x.reshape(n_rows, n_cols)
    if type_name == "Q4_K":
        # 256-elem super-block: f16 d, f16 dmin, 12 bytes of packed
        # 6-bit scale/min pairs (8 each), 128 nibble bytes; sub-block
        # j of 32 elems decodes x = d*sc[j]*n - dmin*m[j]
        dt = np.dtype([("d", "<f2"), ("dmin", "<f2"),
                       ("scales", "u1", (12,)), ("qs", "u1", (128,))])
        want = n_rows * (n_cols // 256) * dt.itemsize
        if len(raw) != want:
            raise ValueError(f"Q4_K: got {len(raw)} bytes, want {want}")
        blocks = np.frombuffer(raw, dt)
        nb = len(blocks)
        s = blocks["scales"].astype("<u2")
        sc = np.empty((nb, 8), "<f4")
        mn = np.empty((nb, 8), "<f4")
        sc[:, :4] = s[:, 0:4] & 63
        mn[:, :4] = s[:, 4:8] & 63
        sc[:, 4:] = (s[:, 8:12] & 0x0F) | ((s[:, 0:4] >> 6) << 4)
        mn[:, 4:] = (s[:, 8:12] >> 4) | ((s[:, 4:8] >> 6) << 4)
        dsc = blocks["d"].astype("<f4")[:, None] * sc
        dmn = blocks["dmin"].astype("<f4")[:, None] * mn
        qs = blocks["qs"].reshape(nb, 4, 32)
        lo = (qs & 0x0F).astype("<f4")
        hi = (qs >> 4).astype("<f4")
        y = np.empty((nb, 4, 64), "<f4")
        y[..., :32] = dsc[:, 0::2, None] * lo - dmn[:, 0::2, None]
        y[..., 32:] = dsc[:, 1::2, None] * hi - dmn[:, 1::2, None]
        return y.reshape(n_rows, n_cols)
    if type_name == "Q6_K":
        # 256-elem super-block: 128 bytes of low nibbles, 64 bytes of
        # high 2-bit pairs, 16 int8 sub-block scales, f16 d; 6-bit
        # code n decodes x = d*sc[..]*(n-32); the (ql,qh,sc) walk is
        # per 128-element half
        dt = np.dtype([("ql", "u1", (128,)), ("qh", "u1", (64,)),
                       ("sc", "i1", (16,)), ("d", "<f2")])
        want = n_rows * (n_cols // 256) * dt.itemsize
        if len(raw) != want:
            raise ValueError(f"Q6_K: got {len(raw)} bytes, want {want}")
        blocks = np.frombuffer(raw, dt)
        nb = len(blocks)
        ql = blocks["ql"].reshape(nb, 2, 64)
        qh = blocks["qh"].reshape(nb, 2, 32)
        scs = blocks["sc"].reshape(nb, 2, 8).astype("<f4")
        q1 = ((ql[..., :32] & 0x0F) | (((qh >> 0) & 3) << 4)).astype(
            "<i2") - 32
        q2 = ((ql[..., 32:] & 0x0F) | (((qh >> 2) & 3) << 4)).astype(
            "<i2") - 32
        q3 = ((ql[..., :32] >> 4) | (((qh >> 4) & 3) << 4)).astype(
            "<i2") - 32
        q4 = ((ql[..., 32:] >> 4) | (((qh >> 6) & 3) << 4)).astype(
            "<i2") - 32
        parts = []
        for k, qk in enumerate((q1, q2, q3, q4)):
            # y[32k + l] scales with sc[2k + l//16] within the half
            s_k = np.repeat(scs[..., 2 * k:2 * k + 2], 16, axis=-1)
            parts.append(s_k * qk.astype("<f4"))
        y = np.concatenate(parts, axis=-1)
        y *= blocks["d"].astype("<f4")[:, None, None]
        return y.reshape(n_rows, n_cols)
    if type_name == "Q5_K":
        # 256-elem super-block (llama.cpp dequantize_row_q5_K): f16 d,
        # f16 dmin, the same 12-byte packed 6-bit scale/min pairs as
        # Q4_K, 32 bytes of 5th bits, 128 nibble bytes.  Chunk c of 64
        # elems reads nibble bytes [32c,32c+32): low nibbles are elems
        # [64c,64c+32) with 5th bit 2c of qh, high nibbles the next 32
        # with 5th bit 2c+1; x = d*sc*q5 - dmin*m.
        dt = np.dtype([("d", "<f2"), ("dmin", "<f2"),
                       ("scales", "u1", (12,)), ("qh", "u1", (32,)),
                       ("qs", "u1", (128,))])
        want = n_rows * (n_cols // 256) * dt.itemsize
        if len(raw) != want:
            raise ValueError(f"Q5_K: got {len(raw)} bytes, want {want}")
        blocks = np.frombuffer(raw, dt)
        nb = len(blocks)
        s = blocks["scales"].astype("<u2")
        sc = np.empty((nb, 8), "<f4")
        mn = np.empty((nb, 8), "<f4")
        sc[:, :4] = s[:, 0:4] & 63
        mn[:, :4] = s[:, 4:8] & 63
        sc[:, 4:] = (s[:, 8:12] & 0x0F) | ((s[:, 0:4] >> 6) << 4)
        mn[:, 4:] = (s[:, 8:12] >> 4) | ((s[:, 4:8] >> 6) << 4)
        dsc = blocks["d"].astype("<f4")[:, None] * sc
        dmn = blocks["dmin"].astype("<f4")[:, None] * mn
        qs = blocks["qs"].reshape(nb, 4, 32)
        shift = (2 * np.arange(4))[None, :, None]
        qh = blocks["qh"][:, None, :]
        lo = ((qs & 0x0F)
              | (((qh >> shift) & 1) << 4).astype("u1")).astype("<f4")
        hi = ((qs >> 4)
              | (((qh >> (shift + 1)) & 1) << 4).astype("u1")).astype(
            "<f4")
        y = np.empty((nb, 4, 64), "<f4")
        y[..., :32] = dsc[:, 0::2, None] * lo - dmn[:, 0::2, None]
        y[..., 32:] = dsc[:, 1::2, None] * hi - dmn[:, 1::2, None]
        return y.reshape(n_rows, n_cols)
    if type_name == "Q2_K":
        # 256-elem super-block (dequantize_row_q2_K): 16 scale bytes
        # (low nibble 4-bit scale, high nibble 4-bit min, one per 16
        # elems), 64 bytes of 2-bit codes, f16 d, f16 dmin.  Half h of
        # 128 elems reads code bytes [32h,32h+32); within a half,
        # shift 2j extracts group j of 32 elems, split into two
        # 16-elem runs each with its own scale byte (index
        # 8h + 2j + run); x = d*sc*q2 - dmin*m.
        dt = np.dtype([("scales", "u1", (16,)), ("qs", "u1", (64,)),
                       ("d", "<f2"), ("dmin", "<f2")])
        want = n_rows * (n_cols // 256) * dt.itemsize
        if len(raw) != want:
            raise ValueError(f"Q2_K: got {len(raw)} bytes, want {want}")
        blocks = np.frombuffer(raw, dt)
        nb = len(blocks)
        q = blocks["qs"].reshape(nb, 2, 1, 32)
        shift = (2 * np.arange(4))[None, None, :, None]
        codes = ((q >> shift) & 3).reshape(nb, 2, 4, 2, 16).astype(
            "<f4")
        sb = blocks["scales"].reshape(nb, 2, 4, 2)
        dl = (blocks["d"].astype("<f4")[:, None, None, None]
              * (sb & 0x0F))
        ml = (blocks["dmin"].astype("<f4")[:, None, None, None]
              * (sb >> 4))
        y = dl[..., None] * codes - ml[..., None]
        return y.reshape(n_rows, n_cols)
    if type_name == "Q3_K":
        # 256-elem super-block (dequantize_row_q3_K): 32 bytes of
        # high-bit masks, 64 bytes of 2-bit codes, 12 bytes packing
        # sixteen 6-bit signed-after-offset scales (kmask layout), f16
        # d.  Group g = 4*half + j uses shift 2j of code bytes
        # [32*half, ...) and hmask bit g; a CLEAR high bit subtracts 4
        # (x = d*(sc-32)*((q2) - (hbit ? 0 : 4))); scale index
        # 8*half + 2j + run as in Q2_K.
        dt = np.dtype([("hmask", "u1", (32,)), ("qs", "u1", (64,)),
                       ("scales", "u1", (12,)), ("d", "<f2")])
        want = n_rows * (n_cols // 256) * dt.itemsize
        if len(raw) != want:
            raise ValueError(f"Q3_K: got {len(raw)} bytes, want {want}")
        blocks = np.frombuffer(raw, dt)
        nb = len(blocks)
        s = blocks["scales"].astype("<u2")
        sc = np.empty((nb, 16), "<i2")
        sc[:, 0:4] = (s[:, 0:4] & 0x0F) | (((s[:, 8:12] >> 0) & 3) << 4)
        sc[:, 4:8] = (s[:, 4:8] & 0x0F) | (((s[:, 8:12] >> 2) & 3) << 4)
        sc[:, 8:12] = (s[:, 0:4] >> 4) | (((s[:, 8:12] >> 4) & 3) << 4)
        sc[:, 12:16] = (s[:, 4:8] >> 4) | (((s[:, 8:12] >> 6) & 3) << 4)
        q = blocks["qs"].reshape(nb, 2, 1, 32)
        shift = (2 * np.arange(4))[None, None, :, None]
        q2 = ((q >> shift) & 3).astype("<i2")            # (nb,2,4,32)
        g = np.arange(8).reshape(1, 2, 4, 1)
        hbit = (blocks["hmask"][:, None, None, :] >> g) & 1
        vals = (q2 - 4 * (1 - hbit)).reshape(nb, 2, 4, 2, 16).astype(
            "<f4")
        dl = (blocks["d"].astype("<f4")[:, None]
              * (sc.astype("<f4") - 32.0)).reshape(nb, 2, 4, 2)
        y = dl[..., None] * vals
        return y.reshape(n_rows, n_cols)
    if type_name == "Q8_K":
        # 256-elem super-block (block_q8_K): f32 d, 256 int8 codes,
        # 16 int16 partial sums (ignored on decode); x = d * q.
        dt = np.dtype([("d", "<f4"), ("qs", "i1", (256,)),
                       ("bsums", "<i2", (16,))])
        want = n_rows * (n_cols // 256) * dt.itemsize
        if len(raw) != want:
            raise ValueError(f"Q8_K: got {len(raw)} bytes, want {want}")
        blocks = np.frombuffer(raw, dt)
        x = blocks["d"][:, None] * blocks["qs"].astype("<f4")
        return x.reshape(n_rows, n_cols)
    raise ValueError(
        f"dequant for ggml type {type_name!r} not implemented "
        f"(supported: {', '.join(sorted(_DEQUANT_TYPES))})"
    )


def quantize_rows(type_name: str, d_scales, q_ints) -> bytes:
    """Fixture/interop ENCODER: pack per-block f16 scales ``d_scales``
    (shape [n_blocks]) and integer codes ``q_ints`` (shape
    [n_blocks, 32]; int8 in [-127,127] for Q8_0, [0,15] nibble codes
    for Q4_0) into the wire block layout.  The inverse of
    :func:`dequant_rows` for exactly-representable fixtures."""
    import numpy as np

    d = np.asarray(d_scales, "<f2")
    q = np.asarray(q_ints)
    if type_name == "Q8_0":
        dt = np.dtype([("d", "<f2"), ("q", "i1", (32,))])
        out = np.zeros(len(d), dt)
        out["d"] = d
        out["q"] = q.astype("i1")
        return out.tobytes()
    if type_name == "Q4_0":
        dt = np.dtype([("d", "<f2"), ("qs", "u1", (16,))])
        out = np.zeros(len(d), dt)
        out["d"] = d
        n = q.astype("u1")
        out["qs"] = n[:, :16] | (n[:, 16:] << 4)
        return out.tobytes()
    raise ValueError(f"quantize for {type_name!r} not implemented")


def pack_q4k(d_scales, dmin_scales, scales, mins, codes) -> bytes:
    """Fixture/interop ENCODER for Q4_K super-blocks: f16 ``d_scales``
    / ``dmin_scales`` (shape [n_sb]), 6-bit ``scales`` / ``mins``
    (shape [n_sb, 8], values 0..63) and nibble ``codes`` (shape
    [n_sb, 256], values 0..15, in DECODED element order).  Inverse of
    the Q4_K branch of :func:`dequant_rows`."""
    import numpy as np

    d = np.asarray(d_scales, "<f2")
    dm = np.asarray(dmin_scales, "<f2")
    sc = np.asarray(scales).astype("<u2")
    mn = np.asarray(mins).astype("<u2")
    if (sc > 63).any() or (mn > 63).any():
        raise ValueError("Q4_K scales/mins are 6-bit (0..63)")
    nb = len(d)
    s = np.empty((nb, 12), "u1")
    s[:, 0:4] = (sc[:, :4] & 63) | ((sc[:, 4:] >> 4) << 6)
    s[:, 4:8] = (mn[:, :4] & 63) | ((mn[:, 4:] >> 4) << 6)
    s[:, 8:12] = (sc[:, 4:] & 0x0F) | ((mn[:, 4:] & 0x0F) << 4)
    c = np.asarray(codes).astype("u1").reshape(nb, 4, 64)
    if (c > 15).any():
        raise ValueError("Q4_K codes are nibbles (0..15)")
    qs = (c[..., :32] | (c[..., 32:] << 4)).reshape(nb, 128)
    dt = np.dtype([("d", "<f2"), ("dmin", "<f2"),
                   ("scales", "u1", (12,)), ("qs", "u1", (128,))])
    out = np.zeros(nb, dt)
    out["d"] = d
    out["dmin"] = dm
    out["scales"] = s
    out["qs"] = qs
    return out.tobytes()


def pack_q6k(d_scales, scales, codes) -> bytes:
    """Fixture/interop ENCODER for Q6_K super-blocks: f16 ``d_scales``
    (shape [n_sb]), int8 ``scales`` (shape [n_sb, 16]) and 6-bit
    ``codes`` (shape [n_sb, 256], values 0..63, in DECODED element
    order).  Inverse of the Q6_K branch of :func:`dequant_rows`."""
    import numpy as np

    d = np.asarray(d_scales, "<f2")
    sc = np.asarray(scales).astype("i1")
    nb = len(d)
    c = np.asarray(codes).astype("u1").reshape(nb, 2, 4, 32)
    if (c > 63).any():
        raise ValueError("Q6_K codes are 6-bit (0..63)")
    q1, q2, q3, q4 = c[:, :, 0], c[:, :, 1], c[:, :, 2], c[:, :, 3]
    ql = np.empty((nb, 2, 64), "u1")
    ql[..., :32] = (q1 & 0x0F) | ((q3 & 0x0F) << 4)
    ql[..., 32:] = (q2 & 0x0F) | ((q4 & 0x0F) << 4)
    qh = ((q1 >> 4) | ((q2 >> 4) << 2)
          | ((q3 >> 4) << 4) | ((q4 >> 4) << 6)).astype("u1")
    dt = np.dtype([("ql", "u1", (128,)), ("qh", "u1", (64,)),
                   ("sc", "i1", (16,)), ("d", "<f2")])
    out = np.zeros(nb, dt)
    out["ql"] = ql.reshape(nb, 128)
    out["qh"] = qh.reshape(nb, 64)
    out["sc"] = sc
    out["d"] = d
    return out.tobytes()


def pack_q5k(d_scales, dmin_scales, scales, mins, codes) -> bytes:
    """Fixture/interop ENCODER for Q5_K super-blocks: f16 ``d_scales``
    / ``dmin_scales`` (shape [n_sb]), 6-bit ``scales`` / ``mins``
    (shape [n_sb, 8], values 0..63) and 5-bit ``codes`` (shape
    [n_sb, 256], values 0..31, in DECODED element order).  Inverse of
    the Q5_K branch of :func:`dequant_rows`."""
    import numpy as np

    d = np.asarray(d_scales, "<f2")
    dm = np.asarray(dmin_scales, "<f2")
    sc = np.asarray(scales).astype("<u2")
    mn = np.asarray(mins).astype("<u2")
    if (sc > 63).any() or (mn > 63).any():
        raise ValueError("Q5_K scales/mins are 6-bit (0..63)")
    nb = len(d)
    s = np.empty((nb, 12), "u1")
    s[:, 0:4] = (sc[:, :4] & 63) | ((sc[:, 4:] >> 4) << 6)
    s[:, 4:8] = (mn[:, :4] & 63) | ((mn[:, 4:] >> 4) << 6)
    s[:, 8:12] = (sc[:, 4:] & 0x0F) | ((mn[:, 4:] & 0x0F) << 4)
    c = np.asarray(codes).astype("u1").reshape(nb, 4, 64)
    if (c > 31).any():
        raise ValueError("Q5_K codes are 5-bit (0..31)")
    lo, hi = c[..., :32], c[..., 32:]
    qs = ((lo & 0x0F) | ((hi & 0x0F) << 4)).reshape(nb, 128)
    qh = np.zeros((nb, 32), "u1")
    for ch in range(4):
        qh |= ((lo[:, ch, :] >> 4) << (2 * ch)).astype("u1")
        qh |= ((hi[:, ch, :] >> 4) << (2 * ch + 1)).astype("u1")
    dt = np.dtype([("d", "<f2"), ("dmin", "<f2"),
                   ("scales", "u1", (12,)), ("qh", "u1", (32,)),
                   ("qs", "u1", (128,))])
    out = np.zeros(nb, dt)
    out["d"] = d
    out["dmin"] = dm
    out["scales"] = s
    out["qh"] = qh
    out["qs"] = qs
    return out.tobytes()


def pack_q2k(d_scales, dmin_scales, scales, mins, codes) -> bytes:
    """Fixture/interop ENCODER for Q2_K super-blocks: f16 ``d_scales``
    / ``dmin_scales`` (shape [n_sb]), 4-bit ``scales`` / ``mins``
    (shape [n_sb, 16], one per 16 elems, values 0..15) and 2-bit
    ``codes`` (shape [n_sb, 256], values 0..3, in DECODED element
    order).  Inverse of the Q2_K branch of :func:`dequant_rows`."""
    import numpy as np

    d = np.asarray(d_scales, "<f2")
    dm = np.asarray(dmin_scales, "<f2")
    sc = np.asarray(scales).astype("u1")
    mn = np.asarray(mins).astype("u1")
    if (sc > 15).any() or (mn > 15).any():
        raise ValueError("Q2_K scales/mins are 4-bit (0..15)")
    nb = len(d)
    c = np.asarray(codes).astype("u1").reshape(nb, 2, 4, 32)
    if (c > 3).any():
        raise ValueError("Q2_K codes are 2-bit (0..3)")
    q = np.zeros((nb, 2, 32), "u1")
    for j in range(4):
        q |= (c[:, :, j, :] << (2 * j)).astype("u1")
    dt = np.dtype([("scales", "u1", (16,)), ("qs", "u1", (64,)),
                   ("d", "<f2"), ("dmin", "<f2")])
    out = np.zeros(nb, dt)
    out["scales"] = (sc & 0x0F) | (mn << 4)
    out["qs"] = q.reshape(nb, 64)
    out["d"] = d
    out["dmin"] = dm
    return out.tobytes()


def pack_q3k(d_scales, scales, codes) -> bytes:
    """Fixture/interop ENCODER for Q3_K super-blocks: f16 ``d_scales``
    (shape [n_sb]), stored 6-bit ``scales`` (shape [n_sb, 16], values
    0..63; decode subtracts 32) and offset 3-bit ``codes`` (shape
    [n_sb, 256], values 0..7 decoding to ``code - 4``, in DECODED
    element order).  Inverse of the Q3_K branch of
    :func:`dequant_rows`."""
    import numpy as np

    d = np.asarray(d_scales, "<f2")
    sc = np.asarray(scales).astype("<u2")
    if (sc > 63).any():
        raise ValueError("Q3_K stored scales are 6-bit (0..63)")
    nb = len(d)
    s = np.empty((nb, 12), "u1")
    s[:, 0:4] = (sc[:, 0:4] & 0x0F) | ((sc[:, 8:12] & 0x0F) << 4)
    s[:, 4:8] = (sc[:, 4:8] & 0x0F) | ((sc[:, 12:16] & 0x0F) << 4)
    s[:, 8:12] = (((sc[:, 0:4] >> 4) & 3)
                  | (((sc[:, 4:8] >> 4) & 3) << 2)
                  | (((sc[:, 8:12] >> 4) & 3) << 4)
                  | (((sc[:, 12:16] >> 4) & 3) << 6))
    c = np.asarray(codes).astype("u1").reshape(nb, 2, 4, 32)
    if (c > 7).any():
        raise ValueError("Q3_K codes are 3-bit (0..7, value = code-4)")
    q = np.zeros((nb, 2, 32), "u1")
    hm = np.zeros((nb, 32), "u1")
    for half in range(2):
        for j in range(4):
            q[:, half, :] |= ((c[:, half, j, :] & 3) << (2 * j)).astype(
                "u1")
            hm |= ((c[:, half, j, :] >> 2) << (4 * half + j)).astype(
                "u1")
    dt = np.dtype([("hmask", "u1", (32,)), ("qs", "u1", (64,)),
                   ("scales", "u1", (12,)), ("d", "<f2")])
    out = np.zeros(nb, dt)
    out["hmask"] = hm
    out["qs"] = q.reshape(nb, 64)
    out["scales"] = s
    out["d"] = d
    return out.tobytes()


def pack_q8k(d_scales, codes) -> bytes:
    """Fixture/interop ENCODER for Q8_K super-blocks: f32 ``d_scales``
    (shape [n_sb]) and int8 ``codes`` (shape [n_sb, 256]); the 16
    per-16-element partial sums are computed.  Inverse of the Q8_K
    branch of :func:`dequant_rows`."""
    import numpy as np

    d = np.asarray(d_scales, "<f4")
    c = np.asarray(codes).astype("<i2").reshape(len(d), 16, 16)
    dt = np.dtype([("d", "<f4"), ("qs", "i1", (256,)),
                   ("bsums", "<i2", (16,))])
    out = np.zeros(len(d), dt)
    out["d"] = d
    out["qs"] = c.reshape(len(d), 256).astype("i1")
    out["bsums"] = c.sum(axis=2).astype("<i2")
    return out.tobytes()


def read_gguf_rows(
    spark: SparkSession, path: str, tensor: str,
    rows_per_split: int = 2048,
) -> DataFrame:
    """Distributed dequantizing row reader for one 2-D GGUF tensor:
    ``(row_idx bigint, vec array<float>)``.  The driver reads only the
    HEADER (`parse_gguf_meta`); tasks read disjoint row-stride byte
    ranges and dequantize vectorized — at a 100 TB model fleet this is
    the safetensors-grade scan shape applied to quantized checkpoints
    (plan from KiB, stream the data tier)."""
    import math

    p = strip_scheme(path)
    m = parse_gguf_meta(p)
    matches = [t for t in m["tensors"] if t["name"] == tensor]
    if not matches:
        raise ValueError(f"{path}: no tensor named {tensor!r}")
    if len(matches) > 1:
        raise ValueError(
            f"{path}: {len(matches)} tensors named {tensor!r} — "
            "ambiguous header"
        )
    t = matches[0]
    if len(t["dims"]) != 2:
        raise ValueError(f"{tensor!r}: need a 2-D tensor, got {t['dims']}")
    n_cols, n_rows = t["dims"]  # ggml order: fastest-varying first
    type_name = t["type_name"]
    # reject unsupported dtypes at PLAN time, not inside tasks
    if type_name not in _DEQUANT_TYPES:
        raise ValueError(
            f"{tensor!r}: no dequant for ggml type {type_name!r} "
            f"(supported: {', '.join(sorted(_DEQUANT_TYPES))})"
        )
    _, belems, bbytes = {v[0]: v for v in _GGML_TYPES.values()}[type_name]
    if belems > 1 and n_cols % belems:
        raise ValueError(
            f"{tensor!r}: row length {n_cols} not a multiple of the "
            f"{belems}-element {type_name} block"
        )
    row_bytes = n_cols // belems * bbytes if belems > 1 else n_cols * bbytes
    base = m["data_start"] + t["offset"]
    n_splits = max(1, math.ceil(n_rows / rows_per_split))
    splits = [
        (p, base, row_bytes, type_name, int(n_cols),
         i * rows_per_split, min((i + 1) * rows_per_split, n_rows))
        for i in range(n_splits)
    ]
    sdf = spark.createDataFrame(
        splits,
        "path string, base bigint, row_bytes bigint, type_name string, "
        "n_cols int, row_lo bigint, row_hi bigint",
    ).repartition(min(n_splits, 64))

    def _run(batches):
        import pandas as pd

        for pdf in batches:
            for r in pdf.itertuples(index=False):
                nr = int(r.row_hi - r.row_lo)
                if nr <= 0:
                    continue
                with open(r.path, "rb") as f:
                    f.seek(int(r.base + r.row_lo * r.row_bytes))
                    raw = f.read(nr * int(r.row_bytes))
                if len(raw) < nr * int(r.row_bytes):
                    raise ValueError(
                        f"{r.path}: tensor data truncated at row "
                        f"{r.row_lo}"
                    )
                x = dequant_rows(r.type_name, raw, nr, int(r.n_cols))
                yield pd.DataFrame({
                    "row_idx": range(int(r.row_lo), int(r.row_hi)),
                    "vec": list(x),
                })

    return sdf.mapInPandas(_run, "row_idx bigint, vec array<float>")
