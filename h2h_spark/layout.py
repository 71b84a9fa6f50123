"""ECL-style declared record layouts.

The reference engine is schema-on-read with a *fixed, user-declared* schema:
an ECL ``RECORD`` structure passed as the ``Layout`` macro parameter, from
which the compiler derives the fixed record length (``sizeof(Layout)``,
``ecl/HDFSConnector.ecl:140``) used by the FLAT scan, or the max record
length for CSV (``sizeof(Layout, MAX)``, line 113).  This module is the
Spark-side equivalent: a :class:`Layout` compiles to

- a :class:`pyspark.sql.types.StructType` (the DataFrame schema),
- a fixed ``record_length`` in bytes (FLAT framing),
- a numpy structured dtype for vectorized pack/unpack of whole partitions.

Type surface (documented ECL types, ``docs/.../HDFS_PipeIn.xml:88-126``):

- ``String(n)``  — STRINGn: fixed-width, space-padded, truncating.
- ``Unsigned(n)``— UNSIGNEDn, n in 1..8, little-endian.  UNSIGNED8 maps to
  ``DecimalType(20, 0)`` because the full unsigned 64-bit range does not fit
  ``LongType`` (SURVEY.md §4.3.8); smaller widths widen to the next signed
  Spark integral type.
- ``Integer(n)`` — INTEGERn, signed little-endian.
- ``Real(n)``    — REAL4/REAL8 → Float/Double (IEEE754 little-endian).
- ``Boolean()``  — 1 byte, 0 = false.
- ``Data(n)``    — raw fixed-width bytes → BinaryType.

Odd integer widths (3, 5, 6, 7 bytes) are legal ECL and supported here via
byte-matrix recomposition (no native numpy dtype exists for them).
"""

from __future__ import annotations

import decimal
import json
from dataclasses import dataclass
from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import types as T

_STD_WIDTHS = {1, 2, 4, 8}


@dataclass(frozen=True)
class FieldType:
    """Base class for layout field types."""

    nbytes: int

    kind: str = "base"

    def spark_type(self) -> T.DataType:
        raise NotImplementedError

    def to_spec(self) -> dict:
        return {"kind": self.kind, "nbytes": self.nbytes}


class String(FieldType):
    """STRINGn — fixed-width, space-padded, right-truncated on overflow."""

    def __init__(self, nbytes: int, encoding: str = "latin-1"):
        if nbytes < 1:
            raise ValueError("String width must be >= 1")
        super().__init__(nbytes=nbytes, kind="string")
        object.__setattr__(self, "encoding", encoding)

    def spark_type(self) -> T.DataType:
        return T.StringType()


class Unsigned(FieldType):
    """UNSIGNEDn, little-endian, n in 1..8."""

    def __init__(self, nbytes: int):
        if not 1 <= nbytes <= 8:
            raise ValueError("Unsigned width must be in 1..8")
        super().__init__(nbytes=nbytes, kind="unsigned")

    def spark_type(self) -> T.DataType:
        # Widen so every unsigned value fits a signed Spark type.
        if self.nbytes == 1:
            return T.ShortType()
        if self.nbytes == 2:
            return T.IntegerType()
        if self.nbytes <= 7:
            return T.LongType()
        return T.DecimalType(20, 0)  # full u64 range exceeds LongType


class Integer(FieldType):
    """INTEGERn, signed little-endian, n in 1..8."""

    def __init__(self, nbytes: int):
        if not 1 <= nbytes <= 8:
            raise ValueError("Integer width must be in 1..8")
        super().__init__(nbytes=nbytes, kind="integer")

    def spark_type(self) -> T.DataType:
        if self.nbytes == 1:
            return T.ByteType()
        if self.nbytes == 2:
            return T.ShortType()
        if self.nbytes <= 4:
            return T.IntegerType()
        return T.LongType()


class Real(FieldType):
    """REAL4 / REAL8 — IEEE754 little-endian."""

    def __init__(self, nbytes: int = 8):
        if nbytes not in (4, 8):
            raise ValueError("Real width must be 4 or 8")
        super().__init__(nbytes=nbytes, kind="real")

    def spark_type(self) -> T.DataType:
        return T.FloatType() if self.nbytes == 4 else T.DoubleType()


class Boolean(FieldType):
    """BOOLEAN — one byte, nonzero = true."""

    def __init__(self):
        super().__init__(nbytes=1, kind="boolean")

    def spark_type(self) -> T.DataType:
        return T.BooleanType()


class Data(FieldType):
    """DATA n — raw fixed-width bytes."""

    def __init__(self, nbytes: int):
        if nbytes < 1:
            raise ValueError("Data width must be >= 1")
        super().__init__(nbytes=nbytes, kind="data")

    def spark_type(self) -> T.DataType:
        return T.BinaryType()


class PackedDecimal(FieldType):
    """DECIMALn.m — packed BCD, IBM convention (two digits per byte, final
    low nibble is the sign: 0xC positive, 0xD negative), most significant
    digit first.  Width = ceil((digits+1)/2) bytes.

    ECL's general type surface includes DECIMALn.m (SURVEY.md §1.3); the
    connector itself never decodes fields, so the byte convention is this
    engine's documented choice.  Maps to ``DecimalType(digits, scale)``.
    """

    def __init__(self, digits: int, scale: int = 0):
        if not 1 <= digits <= 38:
            raise ValueError("PackedDecimal digits must be in 1..38")
        if not 0 <= scale <= digits:
            raise ValueError("scale must be in 0..digits")
        super().__init__(nbytes=(digits + 2) // 2, kind="decimal")
        object.__setattr__(self, "digits", digits)
        object.__setattr__(self, "scale", scale)

    def spark_type(self) -> T.DataType:
        return T.DecimalType(self.digits, self.scale)

    def to_spec(self) -> dict:
        return {
            "kind": self.kind,
            "nbytes": self.nbytes,
            "digits": self.digits,
            "scale": self.scale,
        }


_KIND_TO_CLS = {
    "string": String,
    "unsigned": Unsigned,
    "integer": Integer,
    "real": Real,
    "boolean": Boolean,
    "data": Data,
}


def _field_from_spec(spec: dict) -> FieldType:
    kind = spec["kind"]
    if kind == "decimal":
        return PackedDecimal(spec["digits"], spec["scale"])
    cls = _KIND_TO_CLS[kind]
    if kind == "boolean":
        return cls()
    return cls(spec["nbytes"])


class Layout:
    """An ordered list of ``(name, FieldType)`` — the ECL RECORD analogue.

    ``record_length`` ≅ ``sizeof(Layout)`` (``ecl/HDFSConnector.ecl:140``).
    """

    def __init__(self, fields: Iterable[tuple[str, FieldType]]):
        self.fields: list[tuple[str, FieldType]] = list(fields)
        if not self.fields:
            raise ValueError("Layout needs at least one field")
        names = [n for n, _ in self.fields]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate field names in layout: {names}")
        self.record_length: int = sum(ft.nbytes for _, ft in self.fields)
        self._offsets: dict[str, int] = {}
        off = 0
        for name, ft in self.fields:
            self._offsets[name] = off
            off += ft.nbytes

    # ---------------------------------------------------------------- schema

    def names(self) -> list[str]:
        return [n for n, _ in self.fields]

    def field(self, name: str) -> FieldType:
        for n, ft in self.fields:
            if n == name:
                return ft
        raise KeyError(name)

    def to_struct_type(self, columns: Sequence[str] | None = None) -> T.StructType:
        cols = set(columns) if columns is not None else None
        return T.StructType(
            [
                T.StructField(n, ft.spark_type(), True)
                for n, ft in self.fields
                if cols is None or n in cols
            ]
        )

    def project(self, columns: Sequence[str]) -> "Layout":
        """Sub-layout preserving byte offsets — used for pruned FLAT reads."""
        missing = [c for c in columns if c not in self._offsets]
        if missing:
            raise KeyError(f"unknown columns: {missing}")
        sub = Layout([(n, ft) for n, ft in self.fields if n in set(columns)])
        # Keep the parent's offsets and record length so the numpy dtype
        # still walks full-width records while decoding only what's needed.
        sub._offsets = {n: self._offsets[n] for n in sub.names()}
        sub.record_length = self.record_length
        return sub

    # ------------------------------------------------------------- serialize

    def to_json(self) -> str:
        return json.dumps(
            {
                "fields": [
                    {"name": n, **ft.to_spec()} for n, ft in self.fields
                ],
                "record_length": self.record_length,
                "offsets": self._offsets,
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "Layout":
        spec = json.loads(s)
        lay = cls([(f["name"], _field_from_spec(f)) for f in spec["fields"]])
        if "offsets" in spec:
            lay._offsets = {k: int(v) for k, v in spec["offsets"].items()}
            lay.record_length = int(spec["record_length"])
        return lay

    # ----------------------------------------------------------- numpy codec

    def _np_dtype(self) -> np.dtype:
        """Structured dtype with explicit offsets over the full record.

        Explicit offsets make column pruning free: a projected layout keeps
        the parent record_length, so the dtype steps over unread bytes —
        CPU is only spent on requested fields.
        """
        names, formats, offsets = [], [], []
        for name, ft in self.fields:
            names.append(name)
            offsets.append(self._offsets[name])
            if ft.kind == "string":
                formats.append(f"S{ft.nbytes}")
            elif ft.kind in ("data", "decimal"):
                # V (void), not S: numpy S-dtype strips trailing NULs, but
                # DATA/BCD are exact raw bytes.
                formats.append(f"V{ft.nbytes}")
            elif ft.kind == "boolean":
                formats.append("<u1")
            elif ft.kind in ("unsigned", "integer"):
                if ft.nbytes in _STD_WIDTHS:
                    sign = "u" if ft.kind == "unsigned" else "i"
                    formats.append(f"<{sign}{ft.nbytes}")
                else:
                    formats.append(f"V{ft.nbytes}")  # odd width — recompose
            elif ft.kind == "real":
                formats.append(f"<f{ft.nbytes}")
            else:  # pragma: no cover
                raise ValueError(ft.kind)
        return np.dtype(
            {
                "names": names,
                "formats": formats,
                "offsets": offsets,
                "itemsize": self.record_length,
            }
        )

    @staticmethod
    def _decode_odd_int(raw: np.ndarray, nbytes: int, signed: bool) -> np.ndarray:
        """Recompose little-endian ints of width 3/5/6/7 from raw bytes."""
        b = raw.view((np.uint8, nbytes)).astype(np.uint64)
        weights = (np.uint64(1) << (np.uint64(8) * np.arange(nbytes, dtype=np.uint64)))
        vals = (b * weights).sum(axis=1, dtype=np.uint64)
        if signed:
            sign_bit = np.uint64(1) << np.uint64(8 * nbytes - 1)
            full = np.uint64(1) << np.uint64(8 * nbytes)
            out = vals.astype(np.int64)
            neg = (vals & sign_bit) != 0
            out[neg] = (vals[neg].astype(np.int64)) - np.int64(full)
            return out
        return vals.astype(np.int64)

    def unpack(self, data: bytes | memoryview) -> pd.DataFrame:
        """Vectorized fixed-width decode of whole-record bytes → pandas.

        Enforces the reference's hard error on misaligned files
        (``libhdfsconnector.cpp:84-89``): len(data) must be a multiple of
        record_length.
        """
        nb = len(data)
        if nb % self.record_length != 0:
            raise ValueError(
                f"byte length {nb} is not a multiple of record length "
                f"{self.record_length} (reference semantics: hard error, "
                "libhdfsconnector.cpp:84-89)"
            )
        arr = np.frombuffer(data, dtype=self._np_dtype())
        out: dict[str, object] = {}
        for name, ft in self.fields:
            col = arr[name]
            if ft.kind == "string":
                s = pd.Series(col).str.decode(getattr(ft, "encoding", "latin-1"))
                out[name] = s.str.rstrip(" ")  # ECL STRINGn is space-padded
            elif ft.kind == "data":
                out[name] = pd.Series([bytes(v) for v in col], dtype=object)
            elif ft.kind == "decimal":
                out[name] = self._unpack_bcd(arr[name], ft)
            elif ft.kind == "boolean":
                out[name] = col != 0
            elif ft.kind == "real":
                out[name] = col.astype(np.float32 if ft.nbytes == 4 else np.float64)
            elif ft.kind in ("unsigned", "integer"):
                signed = ft.kind == "integer"
                if ft.nbytes in _STD_WIDTHS:
                    vals = col
                else:
                    vals = self._decode_odd_int(arr[name], ft.nbytes, signed)
                if ft.kind == "unsigned" and ft.nbytes == 8:
                    # u64 → Decimal(20,0); object column of decimal.Decimal
                    out[name] = pd.Series(
                        [decimal.Decimal(int(v)) for v in vals], dtype=object
                    )
                else:
                    out[name] = vals.astype(self._pandas_int_dtype(ft))
            else:  # pragma: no cover
                raise ValueError(ft.kind)
        return pd.DataFrame(out, columns=self.names())

    @staticmethod
    def _unpack_bcd(raw: np.ndarray, ft: FieldType) -> pd.Series:
        """Packed-BCD decode: nibble matrix → unscaled int → Decimal."""
        n = len(raw)
        b = raw.view((np.uint8, ft.nbytes)).reshape(n, ft.nbytes)
        slots = 2 * ft.nbytes - 1
        dig = np.empty((n, 2 * ft.nbytes), dtype=np.uint8)
        dig[:, 0::2] = b >> 4
        dig[:, 1::2] = b & 0x0F
        sign_nib = dig[:, -1]
        digits = dig[:, :-1]
        if (dig[:, :-1] > 9).any():
            raise ValueError(f"invalid BCD digit in field {ft.kind}")
        neg = sign_nib == 0x0D
        if slots <= 18:
            powers = 10 ** np.arange(slots - 1, -1, -1, dtype=np.int64)
            unscaled = (digits.astype(np.int64) * powers).sum(axis=1)
            unscaled = np.where(neg, -unscaled, unscaled)
            vals = [int(v) for v in unscaled]
        else:
            vals = []
            for i in range(n):
                u = int("".join(map(str, digits[i])) or "0")
                vals.append(-u if neg[i] else u)
        q = decimal.Decimal(1).scaleb(-ft.scale)
        return pd.Series(
            [decimal.Decimal(v).scaleb(-ft.scale).quantize(q) for v in vals],
            dtype=object,
        )

    @staticmethod
    def _pack_bcd(col: pd.Series, ft: FieldType) -> np.ndarray:
        """Decimal → packed BCD bytes (sign nibble 0xC/0xD)."""
        n = len(col)
        slots = 2 * ft.nbytes - 1
        limit = 10 ** ft.digits
        out = np.zeros((n, ft.nbytes), dtype=np.uint8)
        q = decimal.Decimal(1).scaleb(-ft.scale)
        for i, v in enumerate(col):
            d = decimal.Decimal(str(v)) if not isinstance(v, decimal.Decimal) else v
            unscaled = int(d.quantize(q, rounding=decimal.ROUND_HALF_UP).scaleb(ft.scale))
            if abs(unscaled) >= limit:
                raise OverflowError(
                    f"{v} exceeds DECIMAL{ft.digits}.{ft.scale}"
                )
            s = str(abs(unscaled)).rjust(slots, "0")
            nibbles = [int(c) for c in s] + [0x0D if unscaled < 0 else 0x0C]
            for j in range(ft.nbytes):
                out[i, j] = (nibbles[2 * j] << 4) | nibbles[2 * j + 1]
        return out

    @staticmethod
    def _pandas_int_dtype(ft: FieldType) -> str:
        if ft.kind == "integer":
            return {1: "int8", 2: "int16", 4: "int32"}.get(ft.nbytes, "int64")
        return {1: "int16", 2: "int32"}.get(ft.nbytes, "int64")

    def pack(self, pdf: pd.DataFrame) -> bytes:
        """Vectorized fixed-width encode pandas → record bytes.

        Strings are space-padded / right-truncated to their declared width
        (ECL STRINGn semantics).  Integers must fit their declared width —
        overflow raises (the reference would silently corrupt; we do not).
        """
        n = len(pdf)
        buf = np.zeros(n, dtype=self._np_dtype_packed())
        for name, ft in self.fields:
            col = pdf[name]
            if ft.kind == "string":
                enc = getattr(ft, "encoding", "latin-1")
                # Pad with spaces BEFORE encoding (ECL space-padding; numpy
                # S-dtype would NUL-pad).  latin-1/ascii are 1 byte/char so
                # the padded length survives encoding — all pandas C loops,
                # no per-value python.
                vals = (
                    col.fillna("")
                    .astype(str)
                    .str.slice(0, ft.nbytes)
                    .str.ljust(ft.nbytes, " ")
                    .str.encode(enc)
                )
                buf[name] = np.array(vals.tolist(), dtype=f"S{ft.nbytes}")
            elif ft.kind == "data":
                padded = b"".join(
                    (v or b"")[: ft.nbytes].ljust(ft.nbytes, b"\x00") for v in col
                )
                buf[name] = np.frombuffer(padded, dtype=f"V{ft.nbytes}")
            elif ft.kind == "decimal":
                bcd = self._pack_bcd(col, ft)
                buf[name] = np.frombuffer(bcd.tobytes(), dtype=f"V{ft.nbytes}")
            elif ft.kind == "boolean":
                buf[name] = col.astype(bool).to_numpy().astype(np.uint8)
            elif ft.kind == "real":
                buf[name] = col.to_numpy(
                    dtype=np.float32 if ft.nbytes == 4 else np.float64
                )
            elif ft.kind in ("unsigned", "integer"):
                signed = ft.kind == "integer"
                lo = -(1 << (8 * ft.nbytes - 1)) if signed else 0
                hi = (1 << (8 * ft.nbytes - 1)) if signed else (1 << (8 * ft.nbytes))
                if (
                    ft.nbytes in _STD_WIDTHS
                    and pd.api.types.is_integer_dtype(col.dtype)
                ):
                    # Fully vectorized fast path (the common case: pandas
                    # integer column from an Arrow batch).
                    arr = col.to_numpy()
                    if arr.size and (
                        int(arr.min()) < lo or int(arr.max()) >= hi
                    ):
                        bad = arr[(arr < lo) | (arr >= hi)][:3].tolist()
                        raise OverflowError(
                            f"values {bad} out of range for {ft.kind}{ft.nbytes}"
                        )
                    sign = "u" if not signed else "i"
                    buf[name] = arr.astype(f"<{sign}{ft.nbytes}")
                    continue
                ints = np.array([int(v) for v in col], dtype=object)
                bad = [int(v) for v in ints if not (lo <= int(v) < hi)]
                if bad:
                    raise OverflowError(
                        f"values {bad[:3]} out of range for {ft.kind}{ft.nbytes}"
                    )
                if ft.nbytes in _STD_WIDTHS:
                    sign = "u" if not signed else "i"
                    buf[name] = ints.astype(f"<{sign}{ft.nbytes}")
                else:
                    u = np.array(
                        [int(v) % (1 << (8 * ft.nbytes)) for v in ints],
                        dtype=np.uint64,
                    )
                    bytes_mat = np.zeros((n, ft.nbytes), dtype=np.uint8)
                    for k in range(ft.nbytes):
                        bytes_mat[:, k] = (u >> np.uint64(8 * k)) & np.uint64(0xFF)
                    buf[name] = np.frombuffer(
                        bytes_mat.tobytes(), dtype=f"V{ft.nbytes}"
                    )
            else:  # pragma: no cover
                raise ValueError(ft.kind)
        return buf.tobytes()

    def _np_dtype_packed(self) -> np.dtype:
        """Dtype for packing — identical to the read dtype but must cover the
        whole record contiguously (pack never projects)."""
        if self.record_length != sum(ft.nbytes for _, ft in self.fields):
            raise ValueError("cannot pack through a projected layout")
        return self._np_dtype()

    def __repr__(self) -> str:
        inner = ", ".join(f"{n}:{ft.kind}{ft.nbytes}" for n, ft in self.fields)
        return f"Layout({inner}; reclen={self.record_length})"
