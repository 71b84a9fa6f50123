"""NumPy ``.npy`` / ``.npz`` array-shard scan — the lab-adjacent tensor
shard format (public spec: numpy "NEP 1 / lib.format": ``\\x93NUMPY``
magic, version, little-endian header length, a Python-literal header
dict ``{'descr', 'fortran_order', 'shape'}``, then raw C-order bytes).

Scale shape: like safetensors, the header plans everything — rows of a
2-D ``[n, d]`` array are a fixed ``d * itemsize`` stride, so one file
splits into byte-range row tasks with O(rows_per_split * d) task
memory.  ``.npz`` is a ZIP container of ``.npy`` members (the engine's
central-directory machinery, ``sources/zipsrc.py``): members STORED
uncompressed (``np.savez`` default) keep full byte-range row splitting
*inside* the container; DEFLATED members (``np.savez_compressed``) are
a documented whole-member decode per task — parallelism across members
and files, the same cliff contract as ``.jsonl.gz``.

Loud failures: fortran_order arrays (row ranges would be column
ranges), non-2-D tensors asked for as rows, unsupported descrs, header
dicts that aren't literal dicts.
"""

from __future__ import annotations

import ast
import struct
from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from h2h_spark.sources.util import list_part_files, strip_scheme

_MAGIC = b"\x93NUMPY"

# normalized descr (endian marker stripped) → spark element DDL
_DESCR_DDL = {
    "f8": "double", "f4": "float", "f2": "float",
    "i8": "bigint", "i4": "int", "i2": "smallint", "i1": "tinyint",
    "u1": "smallint", "b1": "boolean",
}


def parse_npy_header(buf: bytes, origin: str) -> tuple[str, tuple, bool, int]:
    """Parse an ``.npy`` header from its leading bytes: returns
    ``(descr, shape, fortran_order, data_offset)``."""
    if buf[:6] != _MAGIC:
        raise ValueError(f"{origin}: not an .npy file (magic missing)")
    major = buf[6]
    if major == 1:
        (hlen,) = struct.unpack_from("<H", buf, 8)
        data_off = 10 + hlen
    elif major in (2, 3):
        (hlen,) = struct.unpack_from("<I", buf, 8)
        data_off = 12 + hlen
    else:
        raise ValueError(f"{origin}: unsupported .npy format version "
                         f"{major}.{buf[7]}")
    head = buf[data_off - hlen:data_off]
    if len(head) < hlen:
        raise ValueError(f"{origin}: truncated .npy header")
    try:
        meta = ast.literal_eval(head.decode("latin-1").strip())
    except (ValueError, SyntaxError) as e:
        raise ValueError(f"{origin}: malformed .npy header dict: {e}"
                         ) from None
    if not isinstance(meta, dict) or not {
        "descr", "fortran_order", "shape"
    } <= set(meta):
        raise ValueError(f"{origin}: .npy header missing required keys")
    descr = meta["descr"]
    if not isinstance(descr, str):
        raise ValueError(f"{origin}: structured .npy dtypes are not "
                         "supported (descr must be a plain string)")
    return descr, tuple(meta["shape"]), bool(meta["fortran_order"]), data_off


def _descr_key(descr: str, origin: str) -> tuple[str, int, str]:
    """Validate a descr; returns ``(numpy_dtype_str, itemsize, ddl)``."""
    key = descr.lstrip("<>|=")
    if key not in _DESCR_DDL:
        raise ValueError(f"{origin}: unsupported .npy descr {descr!r}")
    itemsize = int(key[1:])
    return descr, itemsize, _DESCR_DDL[key]


def _check_2d(shape: tuple, fortran: bool, origin: str) -> tuple[int, int]:
    if fortran:
        raise ValueError(
            f"{origin}: fortran_order array — row byte-ranges would be "
            "column ranges; transpose at write time"
        )
    if len(shape) != 2:
        raise ValueError(
            f"{origin}: shape {shape} — the row reader needs a 2-D "
            "[n, d] array"
        )
    return int(shape[0]), int(shape[1])


def _rows_to_batches(
    raw: bytes, descr: str, d: int, row_lo: int, n_rows: int, fname: str,
) -> Iterator[pa.RecordBatch]:
    """Decode ``n_rows`` C-order rows starting at global ``row_lo`` into
    bounded Arrow batches."""
    import numpy as np

    arr = np.frombuffer(raw, dtype=descr).reshape(n_rows, d)
    if arr.dtype.byteorder == ">":
        arr = arr.astype(arr.dtype.newbyteorder("<"))
    if arr.dtype.str.endswith("f2"):
        arr = arr.astype("<f4")
    elif arr.dtype.str.endswith("u1"):
        arr = arr.astype("<i2")
    if arr.dtype.kind == "b":
        pa_type = pa.bool_()
        arr = arr.astype(bool)
    else:
        pa_type = pa.from_numpy_dtype(arr.dtype)
    step = max(1, (32 << 20) // max(d * arr.dtype.itemsize, 1))
    for lo in range(0, n_rows, step):
        hi = min(lo + step, n_rows)
        flat = pa.array(arr[lo:hi].reshape(-1), type=pa_type)
        yield pa.record_batch({
            "file": pa.array([fname] * (hi - lo)),
            "row_idx": pa.array(range(row_lo + lo, row_lo + hi),
                                type=pa.int64()),
            "vec": pa.FixedSizeListArray.from_arrays(flat, d)
            .cast(pa.list_(pa_type)),
        })


class NpyInputPartition(InputPartition):
    def __init__(self, path: str, byte_start: int, descr: str, d: int,
                 row_lo: int, row_hi: int):
        self.path = path
        self.byte_start = byte_start
        self.descr = descr
        self.d = d
        self.row_lo = row_lo
        self.row_hi = row_hi


class NpyDataSource(DataSource):
    """``spark.read.format("h2h_npy")`` — rows of every 2-D ``.npy``
    file under ``path`` as ``(file, row_idx, vec)``.  Options: ``path``,
    ``rowsPerSplit`` (default 65536)."""

    @classmethod
    def name(cls) -> str:
        return "h2h_npy"

    def schema(self) -> str:
        files = list_part_files(self.options["path"], pattern="*.npy")
        if not files:
            raise FileNotFoundError(
                f"no .npy files under {self.options['path']}"
            )
        with open(strip_scheme(files[0]), "rb") as f:
            descr, _, _, _ = parse_npy_header(f.read(4096), files[0])
        _, _, ddl = _descr_key(descr, files[0])
        return f"file string, row_idx bigint, vec array<{ddl}>"

    def reader(self, schema) -> "NpyReader":
        return NpyReader(self.options)


class NpyReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.rows_per_split = int(options.get("rowsPerSplit", 65536))

    def partitions(self):
        parts = []
        for fp in sorted(list_part_files(self.path, pattern="*.npy")):
            with open(strip_scheme(fp), "rb") as f:
                descr, shape, fortran, data_off = parse_npy_header(
                    f.read(4096), fp
                )
            _descr_key(descr, fp)
            n, d = _check_2d(shape, fortran, fp)
            for lo in range(0, max(n, 1), self.rows_per_split):
                parts.append(NpyInputPartition(
                    fp, data_off, descr, d, lo,
                    min(lo + self.rows_per_split, n),
                ))
        if not parts:
            raise FileNotFoundError(f"no .npy files under {self.path}")
        return parts

    def read(self, part: NpyInputPartition) -> Iterator[pa.RecordBatch]:
        descr, itemsize, _ = _descr_key(part.descr, part.path)
        row_bytes = part.d * itemsize
        n = part.row_hi - part.row_lo
        with open(strip_scheme(part.path), "rb") as f:
            f.seek(part.byte_start + part.row_lo * row_bytes)
            raw = f.read(n * row_bytes)
        if len(raw) < n * row_bytes:
            raise ValueError(
                f"{part.path}: truncated .npy data at row {part.row_lo}"
            )
        yield from _rows_to_batches(
            raw, descr, part.d, part.row_lo, n, part.path
        )


# ---------------------------------------------------------------------------
# .npz — ZIP of .npy members.  STORED members keep byte-range row
# splits through the container; DEFLATED members decode whole (one task
# per member), loudly documented.
# ---------------------------------------------------------------------------


class NpzInputPartition(InputPartition):
    def __init__(self, path: str, member: dict, byte_start: int,
                 descr: str, d: int, row_lo: int, row_hi: int,
                 stored: bool):
        self.path = path
        self.member = member
        self.byte_start = byte_start  # abs offset of member's npy data
        self.descr = descr
        self.d = d
        self.row_lo = row_lo
        self.row_hi = row_hi
        self.stored = stored


def _npz_member(path: str, member: str) -> dict:
    from h2h_spark.sources.zipsrc import read_central_directory

    want = member if member.endswith(".npy") else member + ".npy"
    for m in read_central_directory(strip_scheme(path)):
        if m["name"] == want:
            return m
    raise ValueError(f"{path}: no member {want!r} in the npz archive")


def _npz_data_offset(path: str, m: dict) -> int:
    """Absolute offset of a STORED member's bytes (local-header walk)."""
    with open(strip_scheme(path), "rb") as f:
        f.seek(m["lfh_off"])
        hdr = f.read(30)
        if hdr[:4] != b"PK\x03\x04":
            raise ValueError(f"{path}: bad local header for {m['name']!r}")
        nlen, elen = struct.unpack_from("<HH", hdr, 26)
    return m["lfh_off"] + 30 + nlen + elen


class NpzDataSource(DataSource):
    """``spark.read.format("h2h_npz")`` — rows of one ``.npy`` member
    across every ``.npz`` file under ``path``.  Options: ``path``,
    ``member`` (required; with or without the ``.npy`` suffix),
    ``rowsPerSplit``."""

    @classmethod
    def name(cls) -> str:
        return "h2h_npz"

    def schema(self) -> str:
        files = list_part_files(self.options["path"], pattern="*.npz")
        if not files:
            raise FileNotFoundError(
                f"no .npz files under {self.options['path']}"
            )
        member = self.options.get("member")
        if not member:
            raise ValueError("option 'member' is required")
        m = _npz_member(files[0], member)
        descr = self._member_descr(files[0], m)
        _, _, ddl = _descr_key(descr, files[0])
        return f"file string, row_idx bigint, vec array<{ddl}>"

    @staticmethod
    def _member_descr(path: str, m: dict) -> str:
        if m["method"] == 0:
            off = _npz_data_offset(path, m)
            with open(strip_scheme(path), "rb") as f:
                f.seek(off)
                head = f.read(4096)
        else:
            from h2h_spark.sources.zipsrc import read_member

            with open(strip_scheme(path), "rb") as f:
                head = read_member(f, m)[:4096]
        descr, _, _, _ = parse_npy_header(head, f"{path}!{m['name']}")
        return descr

    def reader(self, schema) -> "NpzReader":
        return NpzReader(self.options)


class NpzReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.member = options["member"]
        self.rows_per_split = int(options.get("rowsPerSplit", 65536))

    def partitions(self):
        from h2h_spark.sources.zipsrc import read_member

        parts = []
        for fp in sorted(list_part_files(self.path, pattern="*.npz")):
            m = _npz_member(fp, self.member)
            origin = f"{fp}!{m['name']}"
            if m["method"] == 0:
                off = _npz_data_offset(fp, m)
                with open(strip_scheme(fp), "rb") as f:
                    f.seek(off)
                    head = f.read(4096)
                descr, shape, fortran, data_off = parse_npy_header(
                    head, origin
                )
                _descr_key(descr, origin)
                n, d = _check_2d(shape, fortran, origin)
                for lo in range(0, max(n, 1), self.rows_per_split):
                    parts.append(NpzInputPartition(
                        fp, m, off + data_off, descr, d, lo,
                        min(lo + self.rows_per_split, n), True,
                    ))
            elif m["method"] == 8:
                # whole-member decode: header read costs one inflate at
                # plan time only for shape; the task re-inflates once
                with open(strip_scheme(fp), "rb") as f:
                    head = read_member(f, m)[:4096]
                descr, shape, fortran, data_off = parse_npy_header(
                    head, origin
                )
                _descr_key(descr, origin)
                n, d = _check_2d(shape, fortran, origin)
                parts.append(NpzInputPartition(
                    fp, m, data_off, descr, d, 0, n, False,
                ))
            else:
                raise ValueError(
                    f"{origin}: unsupported zip method {m['method']}"
                )
        if not parts:
            raise FileNotFoundError(f"no .npz files under {self.path}")
        return parts

    def read(self, part: NpzInputPartition) -> Iterator[pa.RecordBatch]:
        descr, itemsize, _ = _descr_key(part.descr, part.path)
        row_bytes = part.d * itemsize
        n = part.row_hi - part.row_lo
        fname = f"{part.path}!{part.member['name']}"
        if part.stored:
            with open(strip_scheme(part.path), "rb") as f:
                f.seek(part.byte_start + part.row_lo * row_bytes)
                raw = f.read(n * row_bytes)
            if len(raw) < n * row_bytes:
                raise ValueError(f"{fname}: truncated stored npy data")
        else:
            from h2h_spark.sources.zipsrc import read_member

            with open(strip_scheme(part.path), "rb") as f:
                blob = read_member(f, part.member)
            raw = blob[part.byte_start:part.byte_start + n * row_bytes]
            if len(raw) < n * row_bytes:
                raise ValueError(f"{fname}: truncated deflated npy data")
        yield from _rows_to_batches(
            raw, descr, part.d, part.row_lo, n, fname
        )


def register_npy(spark: SparkSession) -> None:
    spark.dataSource.register(NpyDataSource)
    spark.dataSource.register(NpzDataSource)


def read_npy(
    spark: SparkSession, path: str, rows_per_split: int = 65536
) -> DataFrame:
    register_npy(spark)
    return (
        spark.read.format("h2h_npy")
        .option("path", path)
        .option("rowsPerSplit", str(rows_per_split))
        .load()
    )


def read_npz(
    spark: SparkSession,
    path: str,
    member: str,
    rows_per_split: int = 65536,
) -> DataFrame:
    register_npy(spark)
    return (
        spark.read.format("h2h_npz")
        .option("path", path)
        .option("member", member)
        .option("rowsPerSplit", str(rows_per_split))
        .load()
    )
