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
    # known names without byte math (block layouts not implemented)
    9: ("Q8_1", None, None),
    10: ("Q2_K", None, None), 11: ("Q3_K", None, None),
    12: ("Q4_K", None, None), 13: ("Q5_K", None, None),
    14: ("Q6_K", None, None), 15: ("Q8_K", None, None),
    24: ("I8", None, None), 25: ("I16", None, None),
    26: ("I32", None, None), 27: ("I64", None, None),
    28: ("F64", None, None), 30: ("BF16", 1, 2),
}


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
    """Decode ``n_rows`` x ``n_cols`` elements of F32/Q8_0/Q4_0 row
    data from ``raw`` into a float32 ndarray.  Loud on any other type
    or a size mismatch — never guesses a block layout."""
    import numpy as np

    if n_cols % 32 and type_name in ("Q8_0", "Q4_0"):
        raise ValueError(
            f"{type_name}: row length {n_cols} not a multiple of the "
            "32-element block"
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
    raise ValueError(
        f"dequant for ggml type {type_name!r} not implemented "
        "(supported: F32, Q8_0, Q4_0)"
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
    [t] = [t for t in m["tensors"] if t["name"] == tensor] or [None]
    if t is None:
        raise ValueError(f"{path}: no tensor named {tensor!r}")
    if len(t["dims"]) != 2:
        raise ValueError(f"{tensor!r}: need a 2-D tensor, got {t['dims']}")
    n_cols, n_rows = t["dims"]  # ggml order: fastest-varying first
    type_name = t["type_name"]
    _, belems, bbytes = {v[0]: v for v in _GGML_TYPES.values()}[type_name]
    if belems is None:
        raise ValueError(f"{tensor!r}: no byte math for {type_name}")
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
