"""TAR (ustar, POSIX.1-1988) member scan — dataset tarballs as a
first-class scan source.

tar is not a splittable format in general (members chain by size, no
record delimiter), which is why large-scale pipelines either repack or
index it.  This source makes UNCOMPRESSED ustar archives splittable the
same way the engine's WARC/Avro/CSV scanners do it: plan plain
block-aligned byte ranges, then have each task resync by scanning
512-byte block boundaries for a *validated* header block — the ustar
magic at offset 257 plus the header checksum (sum of the header bytes
with the checksum field blanked, stored in octal).  A data block that
happens to contain the magic fails the checksum with probability
~2^-(checksum entropy); the guard is the same
candidate-scan-then-validate discipline as the WARC splitter, and a
validated false positive is documented as the format's intrinsic limit
(real deployments index tarballs once and trust offsets thereafter).

Ownership: a member belongs to the task whose range contains its
header block; its data blocks may extend past the range end
(read-past-range, like FLAT/WARC).  Memory per task is O(one member's
streamed chunks), never O(range).
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator, Sequence

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from h2h_spark.sources.util import file_size, list_part_files, open_input

_BLOCK = 512
_DEFAULT_MAX_PARTITION_BYTES = 128 * 1024 * 1024


class TarInputPartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def plan_tar_splits(
    paths: Sequence[str],
    max_partition_bytes: int = _DEFAULT_MAX_PARTITION_BYTES,
) -> list[TarInputPartition]:
    """Block-aligned byte ranges (ustar structure is 512-byte blocks, so
    ranges snap to block boundaries — a header never straddles a cut)."""
    parts: list[TarInputPartition] = []
    for path in paths:
        size = file_size(path)
        if size == 0:
            continue
        n_blocks = size // _BLOCK
        n = max(1, math.ceil(size / max_partition_bytes))
        n = min(n, max(1, n_blocks))
        base, rem = divmod(n_blocks, n)
        off = 0
        for i in range(n):
            blocks = base + (1 if i < rem else 0)
            parts.append(
                TarInputPartition(path, off, off + blocks * _BLOCK)
            )
            off += blocks * _BLOCK
        if off < size:  # trailing partial block (malformed; let the
            parts[-1].end = size  # last task surface the error)
    return parts


def _parse_ustar_header(block: bytes) -> dict | None:
    """Validate + parse one 512-byte ustar header block.  Returns None
    for anything that does not checksum as a header (including the
    end-of-archive zero blocks)."""
    if len(block) < _BLOCK or block[257:262] != b"ustar":
        return None
    try:
        stored = int(block[148:156].replace(b"\x00", b" ").strip() or b"0", 8)
    except ValueError:
        return None
    summed = sum(block[:148]) + 8 * 32 + sum(block[156:_BLOCK])
    if summed != stored:
        return None

    def _oct(field: bytes) -> int:
        s = field.replace(b"\x00", b" ").strip()
        return int(s, 8) if s else 0

    name = block[0:100].rstrip(b"\x00").decode("utf-8", "replace")
    prefix = block[345:500].rstrip(b"\x00").decode("utf-8", "replace")
    if prefix:
        name = prefix + "/" + name
    return {
        "name": name,
        "size": _oct(block[124:136]),
        "mtime": _oct(block[136:148]),
        "typeflag": block[156:157].decode("ascii", "replace") or "0",
    }


def scan_tar_range(
    path: str, start: int, end: int
) -> Iterator[tuple[dict, bytes]]:
    """Yield (header, content) for members whose header block starts in
    [start, end).  ``start`` must be block-aligned (the planner's
    contract); resync = advance block-by-block until a header
    validates."""
    size = file_size(path)
    with open_input(path) as f:
        pos = start
        aligned = start == 0
        while pos < end and pos + _BLOCK <= size:
            f.seek(pos)
            block = f.read(_BLOCK)
            hdr = _parse_ustar_header(block)
            if hdr is None:
                if aligned and block.count(0) == _BLOCK:
                    return  # end-of-archive zero block
                if aligned:
                    raise ValueError(
                        f"malformed ustar header at offset {pos}"
                    )
                pos += _BLOCK  # resync scan
                continue
            aligned = True
            data_blocks = math.ceil(hdr["size"] / _BLOCK)
            content = f.read(hdr["size"]) if hdr["size"] else b""
            if len(content) < hdr["size"]:
                raise ValueError(f"truncated tar member at offset {pos}")
            yield hdr, content
            pos += _BLOCK * (1 + data_blocks)


_SCHEMA_DDL = (
    "name string, size bigint, mtime bigint, typeflag string, "
    "content_md5 string"
)


class TarDataSource(DataSource):
    """``spark.read.format("h2h_tar").option("path", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "h2h_tar"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema) -> "TarReader":
        return TarReader(self.options)


class TarReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.max_bytes = int(
            options.get("maxPartitionBytes", _DEFAULT_MAX_PARTITION_BYTES)
        )

    def partitions(self):
        return plan_tar_splits(
            list_part_files(self.path, pattern="*.tar"), self.max_bytes
        )

    def read(self, part: TarInputPartition) -> Iterator[pa.RecordBatch]:
        names, sizes, mtimes, flags, md5s = [], [], [], [], []
        for hdr, content in scan_tar_range(part.path, part.start, part.end):
            names.append(hdr["name"])
            sizes.append(hdr["size"])
            mtimes.append(hdr["mtime"])
            flags.append(hdr["typeflag"])
            md5s.append(hashlib.md5(content).hexdigest())
        yield pa.record_batch(
            [
                pa.array(names, pa.string()),
                pa.array(sizes, pa.int64()),
                pa.array(mtimes, pa.int64()),
                pa.array(flags, pa.string()),
                pa.array(md5s, pa.string()),
            ],
            names=["name", "size", "mtime", "typeflag", "content_md5"],
        )


def register_tar(spark: SparkSession) -> None:
    spark.dataSource.register(TarDataSource)


def read_tar(
    spark: SparkSession,
    path: str,
    max_partition_bytes: int = _DEFAULT_MAX_PARTITION_BYTES,
) -> DataFrame:
    register_tar(spark)
    return (
        spark.read.format("h2h_tar")
        .option("path", path)
        .option("maxPartitionBytes", str(max_partition_bytes))
        .load()
    )
