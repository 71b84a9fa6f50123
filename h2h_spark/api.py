"""The reference's user-facing API surface, one-to-one.

h2h exposes exactly three ECL macros (``ecl/HDFSConnector.ecl``):

- ``PipeIn(ECL_RS, HadoopFileName, Layout, HadoopFileFormat, HDFSHost,
  HDSFPort, HDFSUser='', ConnectorOptions='')``  (lines 54-154)
- ``PipeOut(ECL_RS, HadoopFileName, Layout, HadoopFileFormat, HDFSHost,
  HDSFPort, HDFSUser)``  (lines 175-209)
- ``PipeOutAndMerge(…same…)``  (lines 231-292)

These wrappers reproduce that surface over the engine's sources so a
reference user can port a job mechanically: format strings ``FLAT`` /
``CSV(...)`` / ``XML('row/tag')`` dispatch exactly like the macro's
``#IF`` branches (lines 59, 101, 136), and the CSV option extraction
mirrors the macro's ``REGEXFIND`` of ``QUOTE(...)`` / ``TERMINATOR(...)``
/ ``SEPARATOR(...)`` (lines 101-135).  The idiomatic DataFrame-first API
(:func:`h2h_spark.read_flat` etc.) remains the preferred surface.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from h2h_spark.layout import Layout
from h2h_spark.sources.csv import read_csv, write_csv
from h2h_spark.sources.flat import read_flat, write_flat
from h2h_spark.sources.merge import merge_parts
from h2h_spark.sources.transport import hdfs_uri, set_hdfs_user, webhdfs_uri
from h2h_spark.sources.xml import read_xml


def _parse_format(fmt: str) -> tuple[str, dict]:
    """Dispatch on the format expression text, like the macro's ``#IF``
    (``ecl/HDFSConnector.ecl:59,101,136``)."""
    s = fmt.strip()
    upper = s.upper()
    if upper.startswith("FLAT"):
        return "flat", {}
    if upper.startswith("XML"):
        m = re.search(r"XML\s*\(\s*'([^']*)'", s, re.IGNORECASE)
        return "xml", {"row_tag": m.group(1) if m else "Row"}
    if upper.startswith("CSV"):
        opts: dict = {}
        m = re.search(r"QUOTE\s*\(\s*'((?:\\'|[^'])*)'\s*\)", s, re.IGNORECASE)
        if m:
            opts["quote"] = m.group(1)
        m = re.search(r"TERMINATOR\s*\(\s*'((?:\\'|[^'])*)'\s*\)", s, re.IGNORECASE)
        if m:
            opts["terminator"] = m.group(1)
        m = re.search(r"SEPARATOR\s*\(\s*'((?:\\'|[^'])*)'\s*\)", s, re.IGNORECASE)
        if m:
            opts["sep"] = m.group(1)
        return "csv", opts
    raise ValueError(f"unsupported HadoopFileFormat: {fmt!r}")


def _resolve(
    path: str,
    host: str | None,
    port: int | None,
    transport: str = "hdfs",
    user: str = "",
) -> str:
    # The reference picks its connector at BUILD time (CMakeLists.txt
    # HDFS_CONNECTOR_TYPE: libhdfsconnector | webhdfsconnector); here the
    # same choice is a runtime argument.  For webhdfs the -hdfsuser
    # impersonation rides in the URI userinfo so it reaches executor
    # tasks (driver environ does not).
    if host:
        if transport == "webhdfs":
            return webhdfs_uri(host, port, path, user or None)
        if transport != "hdfs":
            raise ValueError(f"unknown transport {transport!r}")
        return hdfs_uri(host, port, path)
    return path


def pipe_in(
    spark: SparkSession,
    hadoop_file_name: str,
    layout: Layout,
    hadoop_file_format: str = "FLAT",
    hdfs_host: str | None = None,
    hdfs_port: int | None = None,
    hdfs_user: str = "",
    transport: str = "hdfs",
) -> DataFrame:
    """``PipeIn`` — materialize an HDFS file as a partitioned DataFrame."""
    if hdfs_user:
        set_hdfs_user(spark, hdfs_user)
    path = _resolve(hadoop_file_name, hdfs_host, hdfs_port, transport, hdfs_user)
    kind, opts = _parse_format(hadoop_file_format)
    if kind == "flat":
        return read_flat(spark, path, layout)
    if kind == "xml":
        return read_xml(spark, path, layout, row_tag=opts["row_tag"])
    return read_csv(spark, path, layout, **opts)


def pipe_out(
    df: DataFrame,
    hadoop_file_name: str,
    layout: Layout,
    hadoop_file_format: str = "FLAT",
    hdfs_host: str | None = None,
    hdfs_port: int | None = None,
    hdfs_user: str = "",
    transport: str = "hdfs",
) -> None:
    """``PipeOut`` — partitioned write, one part file per partition.

    Like the macro (which has only FLAT and CSV ``#IF`` branches,
    ``ecl/HDFSConnector.ecl:182-208``), XML is not a PipeOut format."""
    if hdfs_user:
        set_hdfs_user(df.sparkSession, hdfs_user)
    path = _resolve(hadoop_file_name, hdfs_host, hdfs_port, transport, hdfs_user)
    kind, opts = _parse_format(hadoop_file_format)
    if kind == "flat":
        write_flat(df, path, layout)
    elif kind == "csv":
        write_csv(df, path, **opts)
    else:
        raise ValueError("PipeOut supports FLAT and CSV only (ecl:175-209)")


def pipe_out_and_merge(
    df: DataFrame,
    hadoop_file_name: str,
    layout: Layout,
    hadoop_file_format: str = "FLAT",
    hdfs_host: str | None = None,
    hdfs_port: int | None = None,
    hdfs_user: str = "",
    transport: str = "hdfs",
) -> None:
    """``PipeOutAndMerge`` — write parts, then concatenate to one file in
    part-index order with ``-cleanmerge 1`` semantics
    (``ecl/HDFSConnector.ecl:231-292``)."""
    path = _resolve(hadoop_file_name, hdfs_host, hdfs_port, transport, hdfs_user)
    parts_dir = path + "-parts"
    pipe_out(df, parts_dir, layout, hadoop_file_format, None, None, hdfs_user)
    merge_parts(parts_dir, path, clean=True)
