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
