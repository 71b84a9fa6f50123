"""TFRecord scan — the TensorFlow training-data container (public
format, tensorflow/core/lib/io/record_writer.h): each record is framed

    uint64 length (little-endian)
    uint32 masked_crc32c(length bytes)
    byte   data[length]
    uint32 masked_crc32c(data)

with CRC-32C (Castagnoli) and TensorFlow's mask
``((crc >> 15) | (crc << 17)) + 0xa282ead8``.

TFRecord has NO sync marker, so stock readers treat a file as
unsplittable and parallelize over shard files only.  This source makes
single files splittable with the engine's candidate-scan-then-validate
discipline (the same realignment contract as the FLAT/WARC/tar
scanners, ``libhdfsconnector.cpp:76-96``): the 12-byte header is
self-validating — the masked CRC of the 8 length bytes matches at a
random offset with probability 2^-32 — so a task realigns by sliding a
12-byte window until a header validates AND the frame it describes
chains into a second validating header (or end-of-range/file).  The
chain check drives the false-positive rate to ~2^-64 per candidate.

Ownership is by header start offset; the record body may extend past
the range end (read-past-range, never double-emitted).  Memory per task
is O(chunk + one record).

CRC cost note: this container has no crc32c accelerator (the hardware
SSE4.2 path lives in C extensions not installed here).  Header CRCs (8
bytes each) are always verified — that is what makes resync safe.  Full
data-CRC verification defaults ON for integrity parity with the ZIP
source's hard CRC check, through a slicing-by-8 software CRC; set
``verifyDataCrc=false`` to scan checksum-blind at wire speed when an
upstream system already guarantees integrity.
"""

from __future__ import annotations

import hashlib
import math
import struct
from typing import Iterator, Sequence

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from h2h_spark.sources.util import file_size, list_part_files, open_input

_CHUNK = 1 << 20
_DEFAULT_MAX_PARTITION_BYTES = 128 * 1024 * 1024
_MASK_DELTA = 0xA282EAD8
_POLY = 0x82F63B78  # CRC-32C (Castagnoli), reflected


def _make_tables() -> list[list[int]]:
    """Slicing-by-8 tables for software CRC-32C."""
    t0 = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ (_POLY if c & 1 else 0)
        t0.append(c)
    tables = [t0]
    for k in range(1, 8):
        prev = tables[k - 1]
        tables.append([t0[prev[n] & 0xFF] ^ (prev[n] >> 8) for n in range(256)])
    return tables


_TABLES = _make_tables()
_T0, _T1, _T2, _T3, _T4, _T5, _T6, _T7 = _TABLES


def crc32c(data: bytes, crc: int = 0) -> int:
    """Software CRC-32C, slicing-by-8 (Intel's algorithm, public)."""
    crc = ~crc & 0xFFFFFFFF
    n = len(data)
    i = 0
    end8 = n - (n % 8)
    while i < end8:
        crc ^= (
            data[i]
            | (data[i + 1] << 8)
            | (data[i + 2] << 16)
            | (data[i + 3] << 24)
        )
        crc = (
            _T7[crc & 0xFF]
            ^ _T6[(crc >> 8) & 0xFF]
            ^ _T5[(crc >> 16) & 0xFF]
            ^ _T4[(crc >> 24) & 0xFF]
            ^ _T3[data[i + 4]]
            ^ _T2[data[i + 5]]
            ^ _T1[data[i + 6]]
            ^ _T0[data[i + 7]]
        )
        i += 8
    while i < n:
        crc = _T0[(crc ^ data[i]) & 0xFF] ^ (crc >> 8)
        i += 1
    return ~crc & 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


def write_tfrecords(path: str, payloads: Sequence[bytes]) -> None:
    """Fixture/test writer: standard TFRecord framing."""
    with open(path, "wb") as f:
        for data in payloads:
            ln = struct.pack("<Q", len(data))
            f.write(ln)
            f.write(struct.pack("<I", masked_crc32c(ln)))
            f.write(data)
            f.write(struct.pack("<I", masked_crc32c(data)))


class TfRecordPartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def plan_tfrecord_splits(
    paths: Sequence[str],
    max_partition_bytes: int = _DEFAULT_MAX_PARTITION_BYTES,
) -> list[TfRecordPartition]:
    parts: list[TfRecordPartition] = []
    for path in paths:
        size = file_size(path)
        if size == 0:
            continue
        n = max(1, math.ceil(size / max_partition_bytes))
        base, rem = divmod(size, n)
        off = 0
        for i in range(n):
            ln = base + (1 if i < rem else 0)
            parts.append(TfRecordPartition(path, off, off + ln))
            off += ln
    return parts


class _TfScanner:
    """Stream records whose 12-byte header starts in [start, end)."""

    def __init__(self, path: str, start: int, end: int, verify_data: bool):
        self.path = path
        self.size = file_size(path)
        self.start = start
        self.end = end
        self.verify_data = verify_data

    def _header_at(self, buf: bytes, off: int) -> int | None:
        """Validate the 12-byte header at buf[off:]; returns the record
        length or None."""
        if off + 12 > len(buf):
            return None
        stored = struct.unpack_from("<I", buf, off + 8)[0]
        if masked_crc32c(buf[off:off + 8]) != stored:
            return None
        return struct.unpack_from("<Q", buf, off)[0]

    def _align(self, f) -> int | None:
        """Slide a window until a header validates AND its frame chains
        into a second validating header (or ends the range/file)."""
        if self.start == 0:
            return 0
        pos = self.start
        while pos < self.end:
            f.seek(pos)
            # enough for a header + a plausible chain probe
            win = f.read(min(_CHUNK, self.size - pos))
            if len(win) < 12:
                return None
            limit = min(len(win) - 12, self.end - pos - 1)
            for off in range(0, limit + 1):
                ln = self._header_at(win, off)
                if ln is None:
                    continue
                # chain check: the next frame's header must validate,
                # unless this record ends at/after end-of-file
                nxt = pos + off + 12 + ln + 4
                if nxt == self.size:
                    return pos + off
                if nxt > self.size:
                    continue  # frame overruns the file: false positive
                f.seek(nxt)
                hdr2 = f.read(12)
                if len(hdr2) == 12 and self._header_at(hdr2, 0) is not None:
                    return pos + off
            pos += max(1, limit + 1)
        return None

    def records(self) -> Iterator[tuple[int, bytes]]:
        with open_input(self.path) as f:
            pos = self._align(f)
            if pos is None:
                return
            while pos < self.end and pos + 12 <= self.size:
                f.seek(pos)
                hdr = f.read(12)
                ln = self._header_at(hdr, 0)
                if ln is None:
                    raise ValueError(
                        f"invalid TFRecord header at offset {pos} in "
                        f"{self.path}"
                    )
                data = f.read(ln)
                tail = f.read(4)
                if len(data) < ln or len(tail) < 4:
                    raise ValueError(
                        f"truncated TFRecord at offset {pos} in {self.path}"
                    )
                if self.verify_data:
                    if masked_crc32c(data) != struct.unpack("<I", tail)[0]:
                        raise ValueError(
                            f"TFRecord data CRC mismatch at offset {pos} "
                            f"in {self.path}"
                        )
                yield pos, data
                pos += 12 + ln + 4


def scan_tfrecord_range(
    path: str, start: int, end: int, verify_data: bool = True
) -> Iterator[tuple[int, bytes]]:
    yield from _TfScanner(path, start, end, verify_data).records()


_SCHEMA_DDL = "offset bigint, length bigint, data_md5 string"


class TfRecordDataSource(DataSource):
    """``spark.read.format("h2h_tfrecord")``"""

    @classmethod
    def name(cls) -> str:
        return "h2h_tfrecord"

    def schema(self) -> str:
        if str(self.options.get("includeData", "false")).lower() in (
            "1", "true", "yes",
        ):
            return _SCHEMA_DDL + ", data binary"
        return _SCHEMA_DDL

    def reader(self, schema) -> "TfRecordReader":
        return TfRecordReader(self.options)


class TfRecordReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.max_bytes = int(
            options.get("maxPartitionBytes", _DEFAULT_MAX_PARTITION_BYTES)
        )
        self.verify_data = str(
            options.get("verifyDataCrc", "true")
        ).lower() in ("1", "true", "yes")
        self.include_data = str(
            options.get("includeData", "false")
        ).lower() in ("1", "true", "yes")

    def partitions(self):
        parts = plan_tfrecord_splits(
            list_part_files(self.path, pattern="*.tfrecord"), self.max_bytes
        )
        if not parts:  # Spark calls read(None) on an empty plan
            parts.append(TfRecordPartition("", 0, 0))
        return parts

    def read(self, part: TfRecordPartition) -> Iterator[pa.RecordBatch]:
        offs, lens, md5s = [], [], []
        datas: list[bytes] = []
        if part.path:
            for pos, data in scan_tfrecord_range(
                part.path, part.start, part.end, self.verify_data
            ):
                offs.append(pos)
                lens.append(len(data))
                md5s.append(hashlib.md5(data).hexdigest())
                if self.include_data:
                    datas.append(data)
        cols = [
            pa.array(offs, pa.int64()),
            pa.array(lens, pa.int64()),
            pa.array(md5s, pa.string()),
        ]
        names = ["offset", "length", "data_md5"]
        if self.include_data:
            cols.append(pa.array(datas, pa.binary()))
            names.append("data")
        yield pa.record_batch(cols, names=names)


def write_tf_examples(
    df: DataFrame, path: str, feature_cols: Sequence[str] | None = None
) -> None:
    """Export a DataFrame as tf.Example TFRecord shards — the training-
    shard write path: one ``part_<i>.tfrecord`` per input partition
    (the engine's ``part_<i>`` naming contract), each row serialized as
    a tf.Example whose features are the selected columns (int/bigint →
    Int64List, float/double → FloatList, string/binary → BytesList,
    arrays thereof element-wise).  Executor-parallel via
    ``foreachPartition`` — no driver data path; empty partitions write
    no file."""
    from h2h_spark.sources.util import ensure_dir, strip_scheme

    import os as _os

    ensure_dir(path)
    base = strip_scheme(path)
    cols = list(feature_cols) if feature_cols is not None else df.columns
    sel = df.select(*cols)

    def _write(rows):
        from pyspark import TaskContext

        from h2h_spark.operators.tfexample import encode_tf_example

        pid = TaskContext.get().partitionId()
        payloads = []
        for r in rows:
            feats = {}
            for c in cols:
                v = r[c]
                if v is None:
                    continue
                feats[c] = v if isinstance(v, (list, tuple)) else [v]
            payloads.append(encode_tf_example(feats))
        if payloads:
            write_tfrecords(
                _os.path.join(base, f"part_{pid}.tfrecord"), payloads
            )

    sel.foreachPartition(_write)


def register_tfrecord(spark: SparkSession) -> None:
    spark.dataSource.register(TfRecordDataSource)


def read_tfrecord(
    spark: SparkSession,
    path: str,
    max_partition_bytes: int = _DEFAULT_MAX_PARTITION_BYTES,
    verify_data_crc: bool = True,
    include_data: bool = False,
) -> DataFrame:
    register_tfrecord(spark)
    return (
        spark.read.format("h2h_tfrecord")
        .option("path", path)
        .option("maxPartitionBytes", str(max_partition_bytes))
        .option("verifyDataCrc", str(verify_data_crc).lower())
        .option("includeData", str(include_data).lower())
        .load()
    )
