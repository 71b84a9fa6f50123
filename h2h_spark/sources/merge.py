"""Merge — concatenate part files into one file, in partition-index order.

The reference's merge (``mergeFile``, ``libhdfsconnector.cpp:709-831``) runs
on node 0 only and sequentially appends ``part_0..N-1`` into the target,
flushing every 1 MiB, optionally deleting the parts afterwards
(``-cleanmerge``).  Merge order = part index order, so merged row order is
the concatenation of partition outputs (SURVEY.md §4.3.7).

Here the same contract is a driver-side stream concat over any
pyarrow-supported filesystem.  The single-writer bottleneck is inherent to
"one output file" — at scale prefer :func:`write_single_file` only for small
results, or keep the partitioned directory (Spark's native model).
"""

from __future__ import annotations

import shutil
from typing import Callable

from pyspark.sql import DataFrame

from h2h_spark.sources.util import (
    is_local,
    list_part_files,
    open_input,
    open_output,
    rename,
    strip_scheme,
)

_FLUSH_THRESHOLD = 1024 * 1024  # reference default: 10× buffer, hdfsconnector.hpp:211


def merge_parts(parts_dir: str, target: str, clean: bool = False) -> int:
    """Concatenate the part files of ``parts_dir`` into ``target``.

    Returns total bytes written.  ``clean=True`` removes the parts directory
    after a successful merge (``-cleanmerge 1``,
    ``libhdfsconnector.cpp:798-828``).
    """
    parts = list_part_files(parts_dir)
    if not parts:
        raise FileNotFoundError(f"no part files under {parts_dir}")
    total = 0
    with open_output(target) as out:
        for part in parts:
            with open_input(part) as src:
                while True:
                    buf = src.read(_FLUSH_THRESHOLD)
                    if not buf:
                        break
                    out.write(buf)
                    total += len(buf)
    if clean:
        _remove_dir(parts_dir)
    return total


def write_single_file(
    df: DataFrame,
    target: str,
    writer: Callable[[DataFrame, str], object],
    coalesce: bool = True,
) -> None:
    """PipeOutAndMerge analogue (``ecl/HDFSConnector.ecl:231-292``).

    ``coalesce=True`` plans a single output task (no post-hoc concat — the
    preferred Spark-level strategy); ``coalesce=False`` writes N parts in
    parallel then merges them driver-side, preserving part order, which is
    closer to the reference's write-then-merge sequence and faster when
    serialization dominates.
    """
    parts_dir = target + "-parts"
    writer(df.coalesce(1) if coalesce else df, parts_dir)
    if coalesce:
        parts = list_part_files(parts_dir)
        if len(parts) != 1:
            raise RuntimeError(f"expected 1 part, found {len(parts)}")
        rename(parts[0], target)
        _remove_dir(parts_dir)
    else:
        merge_parts(parts_dir, target, clean=True)


def _remove_dir(path: str) -> None:
    if is_local(path):
        shutil.rmtree(strip_scheme(path), ignore_errors=True)
    elif path.startswith("webhdfs://"):
        from h2h_spark.sources.webhdfs import client_for

        client, p = client_for(path)
        client.delete(p, recursive=True)
    else:  # pragma: no cover - remote fs
        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(path)
        filesystem.delete_dir(p)
