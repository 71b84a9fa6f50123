"""Transports — HDFS / WebHDFS URIs and user impersonation.

The reference ships two hand-rolled transports: libhdfs JNI
(``libhdfsconnector.cpp:904-918``) and WebHDFS REST with retry loops and
hand-parsed JSON (``webhdfsconnector.cpp:21-238``).  Spark's bundled Hadoop
client speaks both natively — the engine's transport layer is therefore
just URI construction plus the impersonation knob:

- ``-hdfsuser`` (``hdfsConnectAsUser``, ``libhdfsconnector.cpp:913``;
  WebHDFS ``user.name=`` query param, ``webhdfsconnector.cpp:685``) maps to
  ``HADOOP_USER_NAME`` / ``spark.hadoop`` configuration;
- the WebHDFS retry budget (``-whdfsretrymax``, default 1, macro default 10
  — ``ecl/HDFSConnector.ecl:117``) maps to the Hadoop client retry policy
  for JVM-side reads, and to ``H2H_WEBHDFS_RETRY_MAX`` for the engine's own
  REST client.

For the engine's Python-side scanners/sinks, ``webhdfs://`` URIs are served
by :mod:`h2h_spark.sources.webhdfs` — a pure-Python REST client speaking
the reference's exact protocol (ranged ``OPEN`` reads, two-step 307
redirect ``CREATE`` writes, ``user.name`` impersonation, bounded retries),
contract-tested against an in-process HTTP stub (``tests/test_webhdfs.py``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def hdfs_uri(host: str, port: int | None, path: str) -> str:
    """``hdfs://host:port/path`` — the libhdfs transport's address form."""
    p = path if path.startswith("/") else "/" + path
    return f"hdfs://{host}:{port}{p}" if port else f"hdfs://{host}{p}"


def webhdfs_uri(
    host: str, port: int | None, path: str, user: str | None = None
) -> str:
    """``webhdfs://[user@]host:port/path`` — the REST transport's address
    form.  The optional userinfo carries ``-hdfsuser`` impersonation INTO
    executor tasks (the URI is plan state; driver environ is not).  Note
    the reference's WebHDFS back-end lacks merge and XML (SURVEY.md §0);
    here all formats work over either transport."""
    p = path if path.startswith("/") else "/" + path
    auth = f"{user}@{host}" if user else host
    return f"webhdfs://{auth}:{port}{p}" if port else f"webhdfs://{auth}{p}"


def set_hdfs_user(spark: SparkSession, user: str) -> None:
    """Impersonation: the ``-hdfsuser`` analogue.  Takes effect for
    subsequent Hadoop FS connections in this JVM."""
    os.environ["HADOOP_USER_NAME"] = user
    spark._jsc.hadoopConfiguration().set("hadoop.user.name", user)


def set_webhdfs_retries(spark: SparkSession, retries: int) -> None:
    """``-whdfsretrymax`` analogue via the Hadoop client retry policy."""
    conf = spark._jsc.hadoopConfiguration()
    conf.set("dfs.client.retry.policy.enabled", "true")
    conf.set("dfs.http.client.retry.policy.spec", f"1000,{retries}")
