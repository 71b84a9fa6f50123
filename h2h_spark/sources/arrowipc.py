"""Arrow IPC file (Feather v2) scan — the interchange format of the
Arrow ecosystem (pandas/polars/R/DuckDB all write it natively).

Unlike the byte-range formats (FLAT/CSV/WARC), the IPC *file* format
carries a footer with the offset of every record batch, so the planner
does the precise thing instead of the resync dance: one split per run
of record batches (``batches_per_split``), and each task random-accesses
exactly its batches through pyarrow's memory-mapped reader.  The task
output IS the stored Arrow batch — no decode step at all, the cheapest
possible scan path through the Python DataSource API (which speaks
Arrow batches natively).

Schema is read from the first file's footer at plan time and mapped to
Spark DDL (the same inference contract as spark.read.parquet).
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from h2h_spark.sources.util import list_part_files, strip_scheme

_ARROW_DDL = {
    pa.int8(): "tinyint", pa.int16(): "smallint",
    pa.int32(): "int", pa.int64(): "bigint",
    pa.float32(): "float", pa.float64(): "double",
    pa.string(): "string", pa.large_string(): "string",
    pa.bool_(): "boolean", pa.binary(): "binary",
    pa.date32(): "date",
}


def _ddl_type(t: pa.DataType) -> str:
    if t in _ARROW_DDL:
        return _ARROW_DDL[t]
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{_ddl_type(t.value_type)}>"
    raise ValueError(f"arrow type {t} has no Spark DDL mapping")


def arrow_schema_ddl(schema: pa.Schema) -> str:
    return ", ".join(f"{f.name} {_ddl_type(f.type)}" for f in schema)


class ArrowIpcInputPartition(InputPartition):
    def __init__(self, path: str, first_batch: int, last_batch: int):
        self.path = path
        self.first_batch = first_batch
        self.last_batch = last_batch  # exclusive


class ArrowIpcDataSource(DataSource):
    """``spark.read.format("h2h_arrow").option("path", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "h2h_arrow"

    def schema(self) -> str:
        files = list_part_files(self.options["path"], pattern="*.arrow")
        if not files:
            raise FileNotFoundError(
                f"no .arrow files under {self.options['path']}"
            )
        with pa.memory_map(strip_scheme(files[0]), "r") as m:
            return arrow_schema_ddl(pa.ipc.open_file(m).schema)

    def reader(self, schema) -> "ArrowIpcReader":
        return ArrowIpcReader(self.options)


class ArrowIpcReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.batches_per_split = int(options.get("batchesPerSplit", 16))

    def partitions(self):
        parts = []
        for f in list_part_files(self.path, pattern="*.arrow"):
            with pa.memory_map(strip_scheme(f), "r") as m:
                n = pa.ipc.open_file(m).num_record_batches
            for lo in range(0, max(n, 1), self.batches_per_split):
                parts.append(
                    ArrowIpcInputPartition(
                        f, lo, min(lo + self.batches_per_split, n)
                    )
                )
        return parts

    def read(self, part: ArrowIpcInputPartition) -> Iterator[pa.RecordBatch]:
        with pa.memory_map(strip_scheme(part.path), "r") as m:
            rd = pa.ipc.open_file(m)
            for i in range(part.first_batch, part.last_batch):
                yield rd.get_batch(i)


def register_arrow_ipc(spark: SparkSession) -> None:
    spark.dataSource.register(ArrowIpcDataSource)


def read_arrow_ipc(
    spark: SparkSession, path: str, batches_per_split: int = 16
) -> DataFrame:
    register_arrow_ipc(spark)
    return (
        spark.read.format("h2h_arrow")
        .option("path", path)
        .option("batchesPerSplit", str(batches_per_split))
        .load()
    )


def write_arrow_ipc(table: pa.Table, path: str, chunk_rows: int = 4096) -> None:
    """Fixture/interop writer: one IPC file, batches of ``chunk_rows``."""
    with pa.OSFile(path, "wb") as f:
        with pa.ipc.new_file(f, table.schema) as w:
            for batch in table.to_batches(max_chunksize=chunk_rows):
                w.write_batch(batch)
