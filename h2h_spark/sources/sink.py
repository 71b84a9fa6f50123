"""Partitioned file sink — one part file per DataFrame partition.

This is the engine's PipeOut analogue (``ecl/HDFSConnector.ecl:175-209``,
``libhdfsconnector.cpp:833-902``): the reference writes one HDFS part file
``<name>-parts/part_<nodeid>_<clustercount>`` per Thor worker.  Here each
Spark partition serializes itself (Arrow batches in, bytes out) and writes
one part file; the driver then commits by renaming temp files to the final
``part_<i>_<N>`` names — a task-commit protocol the reference lacks (a
failed h2h node leaves a partial part behind; a failed Spark task leaves
only an orphaned temp that commit ignores).

Scale note: tasks stream batches to the file as they arrive (no
whole-partition buffering), so partition size is bounded by the upstream
plan, not by this sink.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass
from typing import Callable, Iterator

import pyarrow as pa
from pyspark import TaskContext
from pyspark.sql import DataFrame

from h2h_spark.sources.util import ensure_dir, is_local, open_output, rename, strip_scheme

_META_SCHEMA = "part_index int, n_rows bigint, n_bytes bigint, temp_path string"


@dataclass
class PartInfo:
    part_index: int
    n_rows: int
    n_bytes: int
    path: str


def write_partition_files(
    df: DataFrame,
    path: str,
    serialize: Callable[[pa.RecordBatch], bytes],
    *,
    header: bytes = b"",
    footer: bytes = b"",
    overwrite: bool = True,
    suffix: str = "",
) -> list[PartInfo]:
    """Write ``df`` as one file per partition under ``path``.

    ``serialize`` turns each Arrow batch into wire bytes; ``header``/
    ``footer`` wrap every part (used by the XML writer).  Returns per-part
    metadata (the reference's "records found"/byte counters,
    ``libhdfsconnector.cpp:562,896``, but machine-readable).
    """
    if overwrite:
        _remove(path)
    ensure_dir(path)
    base = strip_scheme(path) if is_local(path) else path
    run_id = uuid.uuid4().hex[:8]

    def _task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        # Attempt id in the temp name: two live attempts of the same task
        # (speculation, stage retry with a zombie) must not interleave
        # writes into one file.  The driver commits exactly the attempt
        # whose meta row Spark delivered (the winner) and sweeps the rest.
        att = ctx.taskAttemptId() if ctx is not None else 0
        tmp = os.path.join(base, f"_tmp-{run_id}-{pid:05d}-a{att}{suffix}")
        n_rows = 0
        n_bytes = 0
        with open_output(tmp) as f:
            if header:
                f.write(header)
                n_bytes += len(header)
            for batch in batches:
                data = serialize(batch)
                f.write(data)
                n_rows += batch.num_rows
                n_bytes += len(data)
            if footer:
                f.write(footer)
                n_bytes += len(footer)
        yield pa.RecordBatch.from_pydict(
            {
                "part_index": pa.array([pid], pa.int32()),
                "n_rows": pa.array([n_rows], pa.int64()),
                "n_bytes": pa.array([n_bytes], pa.int64()),
                "temp_path": pa.array([tmp], pa.string()),
            }
        )

    meta_rows = df.mapInArrow(_task, _META_SCHEMA).collect()
    # One winner per partition: Spark delivers results from exactly one
    # attempt, but be defensive about duplicates in the collected meta.
    by_pid: dict[int, object] = {}
    for row in meta_rows:
        by_pid.setdefault(row.part_index, row)
    winners = sorted(by_pid.values(), key=lambda r: r.part_index)
    n = len(winners)
    infos: list[PartInfo] = []
    # Commit: temp → part_<i>_<N> (naming parity: hdfsconnector.hpp:65-72).
    for i, row in enumerate(winners):
        final = os.path.join(base, f"part_{i}_{n}{suffix}")
        rename(row.temp_path, final)
        infos.append(PartInfo(i, row.n_rows, row.n_bytes, final))
    # Sweep loser-attempt temp files (zombie/speculative attempts).
    if is_local(path):
        import glob as _glob

        for stale in _glob.glob(os.path.join(base, f"_tmp-{run_id}-*")):
            try:
                os.remove(stale)
            except OSError:
                pass
    with open_output(os.path.join(base, "_SUCCESS")):
        pass
    return infos


def _remove(path: str) -> None:
    if is_local(path):
        p = strip_scheme(path)
        if os.path.isdir(p):
            shutil.rmtree(p)
        elif os.path.exists(p):
            os.remove(p)
    elif path.startswith("webhdfs://"):
        from h2h_spark.sources.webhdfs import WebHdfsError, client_for

        client, p = client_for(path)
        try:
            client.delete(p, recursive=True)
        except WebHdfsError:
            pass  # absent target — nothing to overwrite
    else:  # pragma: no cover - remote fs
        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(path)
        info = filesystem.get_file_info(p)
        if info.type.name != "NotFound":
            filesystem.delete_dir_contents(p, missing_dir_ok=True)
