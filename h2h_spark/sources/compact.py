"""Compaction — the small-files problem.

LLM-data pipelines generate directories of thousands of small part files
(per-batch streaming sinks, high-parallelism writes of filtered data).
Small files poison 100 TB scans: per-file open cost, starved columnar
encoding, metadata pressure on the NameNode/catalog.  ``compact`` rewrites
a parquet directory into ~``target_bytes`` files using a real byte-size
estimate (not a row-count guess), preserving schema and content.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from h2h_spark.sources.util import is_local, list_part_files, strip_scheme


def directory_bytes(spark: SparkSession, path: str) -> int:
    """Total data bytes of a directory's part files."""
    import os

    if is_local(path):
        return sum(
            os.path.getsize(p) for p in list_part_files(path, pattern="part*")
        )
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(conf)
    return fs.getContentSummary(jpath).getLength()


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 256 * 1024 * 1024,
) -> int:
    """Rewrite parquet directory ``src`` into ``dst`` with ~target-sized
    files.  Returns the output file count."""
    total = directory_bytes(spark, src)
    n = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src)
    # coalesce, not repartition: no shuffle — tasks concatenate input splits.
    df.coalesce(n).write.mode("overwrite").parquet(dst)
    return len(list_part_files(dst, pattern="part*"))
