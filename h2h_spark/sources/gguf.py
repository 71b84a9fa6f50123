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
    and F32 numpy tensors, 32-byte aligned tensor data.  Note GGUF
    stores dims in ggml order (fastest-varying first) — this writer
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
        arr = np.ascontiguousarray(arr, dtype="<f4")
        w_str(name)
        dims = list(arr.shape)[::-1]  # ggml order
        buf.write(struct.pack("<I", len(dims)))
        buf.write(struct.pack(f"<{len(dims)}Q", *dims))
        buf.write(struct.pack("<IQ", 0, off))  # F32
        raw = arr.tobytes()
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
