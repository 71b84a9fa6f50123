"""FLAT — fixed-length binary records (the reference's core wire format).

Read path re-expresses the reference's per-node offset math
(``streamFileOffset`` / ``getRecordCount``, ``libhdfsconnector.cpp:76-96,
652-707``) as a Spark Python DataSource: the planner slices each file into
record-aligned byte ranges (remainder records spread to low-numbered splits,
exactly the ``getRecordCount`` rule), and each task decodes its slice with a
numpy structured dtype — vectorized, zero-copy from the read buffer.

Semantics preserved (SURVEY.md §4.3):
- file size must be an exact multiple of record length → hard error
  (``libhdfsconnector.cpp:84-89``);
- UNSIGNED8 decodes to Decimal(20,0) — the full u64 range does not fit a
  signed 64-bit Spark LongType.

Scale posture: split size is controlled by ``maxPartitionBytes`` (default
128 MiB, Spark's own default) so a 100 TB dataset plans ~800k tasks, the
same shape Spark's native FileSourceScanExec would produce.  Column pruning
is supported at the source (``columns=...``): a projected layout keeps
parent byte offsets, so the structured dtype steps over unread bytes and
decode cost is proportional to the columns actually requested.
"""

from __future__ import annotations

import math
from typing import Iterator, Sequence

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
)

from h2h_spark.layout import Layout
from h2h_spark.sources import sink as _sink
from h2h_spark.sources.util import file_size, list_part_files, open_input

_DEFAULT_MAX_PARTITION_BYTES = 128 * 1024 * 1024
_BATCH_RECORDS = 65536


class FlatInputPartition(InputPartition):
    def __init__(self, path: str, offset: int, n_records: int):
        self.path = path
        self.offset = offset
        self.n_records = n_records


def plan_flat_splits(
    paths: Sequence[str],
    record_length: int,
    max_partition_bytes: int = _DEFAULT_MAX_PARTITION_BYTES,
) -> list[FlatInputPartition]:
    """Record-aligned split planning.

    Per file: N = ceil(size / max_partition_bytes) splits; split *i* gets
    ``total_recs // N`` records plus one extra if ``i < total_recs % N`` —
    the reference's ``getRecordCount`` balancing rule
    (``libhdfsconnector.cpp:90-95``).
    """
    parts: list[FlatInputPartition] = []
    for path in paths:
        size = file_size(path)
        if size == 0:
            continue
        if size % record_length != 0:
            raise ValueError(
                f"{path}: file size {size} is not a multiple of record "
                f"length {record_length} (libhdfsconnector.cpp:84-89)"
            )
        total = size // record_length
        n = max(1, math.ceil(size / max_partition_bytes))
        n = min(n, total)
        base, rem = divmod(total, n)
        offset = 0
        for i in range(n):
            recs = base + (1 if i < rem else 0)
            parts.append(FlatInputPartition(path, offset, recs))
            offset += recs * record_length
    return parts


def _read_split(layout: Layout, part: FlatInputPartition) -> Iterator[pa.RecordBatch]:
    """Decode one record-aligned byte range into Arrow batches."""
    arrow_schema = _arrow_schema(layout)
    with open_input(part.path) as f:
        f.seek(part.offset)
        remaining = part.n_records
        while remaining > 0:
            take = min(remaining, _BATCH_RECORDS)
            data = f.read(take * layout.record_length)
            if not data:
                break
            pdf = layout.unpack(data)
            yield pa.RecordBatch.from_pandas(
                pdf, schema=arrow_schema, preserve_index=False
            )
            remaining -= take


def _arrow_schema(layout: Layout) -> pa.Schema:
    out = []
    for name, ft in layout.fields:
        if ft.kind == "string":
            t = pa.string()
        elif ft.kind == "data":
            t = pa.binary()
        elif ft.kind == "boolean":
            t = pa.bool_()
        elif ft.kind == "real":
            t = pa.float32() if ft.nbytes == 4 else pa.float64()
        elif ft.kind == "unsigned":
            if ft.nbytes == 1:
                t = pa.int16()
            elif ft.nbytes == 2:
                t = pa.int32()
            elif ft.nbytes <= 7:
                t = pa.int64()
            else:
                t = pa.decimal128(20, 0)
        elif ft.kind == "integer":
            t = {1: pa.int8(), 2: pa.int16(), 4: pa.int32()}.get(ft.nbytes, pa.int64())
        elif ft.kind == "decimal":
            t = pa.decimal128(ft.digits, ft.scale)
        else:  # pragma: no cover
            raise ValueError(ft.kind)
        out.append(pa.field(name, t))
    return pa.schema(out)


_PUSHABLE = (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
    In,
    IsNotNull,
    StringStartsWith,
)


def _apply_filters(pdf, filters: list[Filter]):
    """Vectorized residual-filter evaluation on the decoded batch.

    Pushing these below the Arrow boundary means filtered records never
    cross into the JVM — at scale the python→JVM transfer is the FLAT
    scan's main tax, so selective scans get proportionally cheaper.
    """
    import numpy as np

    mask = np.ones(len(pdf), dtype=bool)
    for f in filters:
        col = pdf[f.attribute[0]]
        if isinstance(f, EqualTo):
            mask &= (col == f.value).to_numpy(dtype=bool)
        elif isinstance(f, GreaterThan):
            mask &= (col > f.value).to_numpy(dtype=bool)
        elif isinstance(f, GreaterThanOrEqual):
            mask &= (col >= f.value).to_numpy(dtype=bool)
        elif isinstance(f, LessThan):
            mask &= (col < f.value).to_numpy(dtype=bool)
        elif isinstance(f, LessThanOrEqual):
            mask &= (col <= f.value).to_numpy(dtype=bool)
        elif isinstance(f, In):
            mask &= col.isin(list(f.value)).to_numpy(dtype=bool)
        elif isinstance(f, StringStartsWith):
            mask &= col.str.startswith(f.value).fillna(False).to_numpy(dtype=bool)
        # IsNotNull: fixed-width fields are never null — no-op.
    return pdf[mask] if not mask.all() else pdf


class FlatDataSourceReader(DataSourceReader):
    def __init__(self, options: dict, layout: Layout):
        self.options = options
        self.layout = layout
        self.path = options["path"]
        self.max_partition_bytes = int(
            options.get("maxpartitionbytes", _DEFAULT_MAX_PARTITION_BYTES)
        )
        self.filters: list[Filter] = []

    def pushFilters(self, filters: list[Filter]):
        """Accept simple comparison predicates on layout fields; evaluate
        them numpy-side before the Arrow hand-off.  Everything else is
        yielded back for Spark to apply."""
        names = set(self.layout.names())
        for f in filters:
            if (
                isinstance(f, _PUSHABLE)
                and len(getattr(f, "attribute", ())) == 1
                and f.attribute[0] in names
            ):
                self.filters.append(f)
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        parts = plan_flat_splits(
            list_part_files(self.path),
            self.layout.record_length,
            self.max_partition_bytes,
        )
        # All-empty input (e.g. a write of 0 rows still creates part files —
        # h2h writes a part per node regardless): Spark requires >=1
        # partition, so emit one empty sentinel split.
        return parts or [FlatInputPartition("", 0, 0)]

    def read(self, partition: FlatInputPartition) -> Iterator[pa.RecordBatch]:
        if partition is None or not partition.path or partition.n_records == 0:
            return
        if not self.filters:
            yield from _read_split(self.layout, partition)
            return
        arrow_schema = _arrow_schema(self.layout)
        with open_input(partition.path) as f:
            f.seek(partition.offset)
            remaining = partition.n_records
            while remaining > 0:
                take = min(remaining, _BATCH_RECORDS)
                data = f.read(take * self.layout.record_length)
                if not data:
                    break
                pdf = _apply_filters(self.layout.unpack(data), self.filters)
                if len(pdf):
                    yield pa.RecordBatch.from_pandas(
                        pdf.reset_index(drop=True),
                        schema=arrow_schema,
                        preserve_index=False,
                    )
                remaining -= take


class FlatDataSource(DataSource):
    """``spark.read.format("h2h_flat").option("layout", lay.to_json())``."""

    @classmethod
    def name(cls) -> str:
        return "h2h_flat"

    def _layout(self) -> Layout:
        if "layout" not in self.options:
            # Option validation — the reference's validateParameters
            # analogue (hdfsconnector.hpp:173-203).
            raise ValueError(
                "h2h_flat requires .option('layout', Layout(...).to_json())"
            )
        lay = Layout.from_json(self.options["layout"])
        cols = self.options.get("columns")
        if cols:
            lay = lay.project([c.strip() for c in cols.split(",")])
        return lay

    def schema(self) -> T.StructType:
        return self._layout().to_struct_type()

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return FlatDataSourceReader(dict(self.options), self._layout())


def read_flat(
    spark: SparkSession,
    path: str,
    layout: Layout,
    columns: Sequence[str] | None = None,
    max_partition_bytes: int = _DEFAULT_MAX_PARTITION_BYTES,
) -> DataFrame:
    """PipeIn(FLAT) analogue (``ecl/HDFSConnector.ecl:136-153``)."""
    reader = (
        spark.read.format("h2h_flat")
        .option("layout", layout.to_json())
        .option("maxpartitionbytes", str(max_partition_bytes))
    )
    if columns is not None:
        reader = reader.option("columns", ",".join(columns))
    return reader.load(path)


def write_flat(
    df: DataFrame,
    path: str,
    layout: Layout,
    overwrite: bool = True,
) -> list[_sink.PartInfo]:
    """PipeOut(FLAT) analogue (``libhdfsconnector.cpp:833-902``): one
    fixed-width part file per partition, ``part_<i>_<N>`` naming."""
    names = layout.names()
    df = df.select(*names)  # enforce field order = layout order

    def _serialize(batch: pa.RecordBatch) -> bytes:
        return layout.pack(batch.to_pandas())

    return _sink.write_partition_files(df, path, _serialize, overwrite=overwrite)
