"""File metadata — the reference's ``HdfsFileStatus`` surface.

``hdfsconnector.hpp:43-55`` defines the metadata record (accessTime,
blockSize, group, length, modificationTime, owner, pathSuffix, permission,
replication, type), populated from WebHDFS ``GETFILESTATUS`` JSON
(``webhdfsconnector.cpp:79-167``) or ``hdfsGetPathInfo``
(``libhdfsconnector.cpp:51-74,124-135``).  Here the same record comes from
the Hadoop ``FileSystem`` API through the live JVM — one client stack for
``file://``, ``hdfs://`` and ``webhdfs://`` alike.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def file_status(spark: SparkSession, path: str) -> dict:
    """HdfsFileStatus-shaped dict for ``path`` (file or directory)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(conf)
    st = fs.getFileStatus(jpath)
    return {
        "accessTime": st.getAccessTime(),
        "blockSize": st.getBlockSize(),
        "group": st.getGroup(),
        "length": st.getLen(),
        "modificationTime": st.getModificationTime(),
        "owner": st.getOwner(),
        "pathSuffix": st.getPath().getName(),
        "permission": str(st.getPermission()),
        "replication": st.getReplication(),
        "type": "DIRECTORY" if st.isDirectory() else "FILE",
    }


def total_parts_size(spark: SparkSession, parts_dir: str) -> int:
    """Sum of part sizes (``getTotalFilePartsSize``,
    ``webhdfsconnector.cpp:478-500``)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(parts_dir)
    fs = jpath.getFileSystem(conf)
    total = 0
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith("_") and not name.endswith(".crc"):
            total += st.getLen()
    return total


def parquet_rowgroup_stats(spark: SparkSession, path: str, column: str):
    """Per-row-group parquet FOOTER statistics for one column — the
    introspection behind partition-pruning audits (how many groups can
    a predicate skip?) and compaction planning (group size skew).

    Footer-only reads: the file list distributes over executors and
    each task reads just its files' metadata blocks (the same
    footer-index role the ZIP source's central-directory read plays) —
    no data pages are touched, so a 100 TB table audits at
    O(files × footer), not O(bytes).  Output: ``(file, row_group,
    n_rows, stats_min, stats_max)`` with stats as strings (the
    type-generic form parquet stores)."""
    import glob as _glob
    import os as _os

    from h2h_spark.sources.util import strip_scheme

    base = strip_scheme(path)
    files = sorted(
        _glob.glob(_os.path.join(base, "*.parquet"))
        if _os.path.isdir(base) else [base]
    )
    if not files:
        raise ValueError(f"no parquet files under {path}")
    fdf = spark.createDataFrame([(f,) for f in files], "file string")

    def _walk(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                md = pq.ParquetFile(f).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        if col.path_in_schema != column:
                            continue
                        st = col.statistics
                        rows.append((
                            _os.path.basename(f), rg, g.num_rows,
                            None if st is None else str(st.min),
                            None if st is None else str(st.max),
                        ))
            yield pd.DataFrame(
                rows,
                columns=["file", "row_group", "n_rows",
                         "stats_min", "stats_max"],
            )

    return fdf.repartition(min(len(files), 64)).mapInPandas(
        _walk,
        "file string, row_group bigint, n_rows bigint, "
        "stats_min string, stats_max string",
    )
