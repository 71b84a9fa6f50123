"""URL canonicalization and crawl-side corpus governance.

A web-crawl corpus re-fetches the same page under many spellings —
scheme/host case, default ports, tracking parameters (``utm_*``,
``fbclid``, ``gclid``), parameter order, fragments.  Canonicalizing
before dedup collapses these to one key, which is the first dedup stage
of every crawl pipeline (cheaper than any content hash: it is pure
column arithmetic, no shuffle until the final group).

All transforms are built-in expressions (regexp + array ops) — the
whole stage stays inside whole-stage codegen, no Python on the hot
path, and is expressible 1:1 in ANSI-ish SQL for cross-engine
verification.

Canonical form (RFC 3986 normalization + tracker stripping):
- scheme and host lowercased;
- default port stripped (``:443`` for https, ``:80`` for http);
- fragment dropped;
- query parameters whose key is ``utm_*``, ``fbclid`` or ``gclid``
  dropped; the rest sorted byte-wise and re-joined;
- empty query → no ``?``.

``cap_per_domain`` is the companion governance operator: cap the number
of documents any single host contributes to a training corpus (domain
diversity).  Selection is by a *portable* deterministic hash order
(md5-derived, :func:`h2h_spark.operators.dedup.portable_hash60`), so
the kept set is reproducible in any engine — one window shuffle on
host, the 100 TB shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from h2h_spark.operators.dedup import portable_hash60

_TRACKERS = ("utm_", "fbclid=", "gclid=")


def url_parts(url: Column) -> tuple[Column, Column, Column, Column]:
    """(scheme, hostport, path, query) via RFC 3986 appendix-B style
    regexes (no fragment — callers drop it by construction)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1))
    hostport = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    # the query starts at the first ``?`` BEFORE any ``#`` — a ``?``
    # inside the fragment (``/p#frag?x``) is fragment text, not a query
    # (RFC 3986 §3.4/§3.5)
    query = F.regexp_extract(url, r"^[^#]*?\?([^#]*)", 1)
    return scheme, hostport, path, query


def canonicalize_url(url: Column) -> Column:
    """Canonical URL as a single built-in expression tree."""
    scheme, hostport, path, query = url_parts(url)
    host0 = F.lower(hostport)
    host = (
        F.when((scheme == F.lit("https")) & host0.endswith(":443"),
               F.substring(host0, 1, F.length(host0) - 4))
        .when((scheme == F.lit("http")) & host0.endswith(":80"),
              F.substring(host0, 1, F.length(host0) - 3))
        .otherwise(host0)
    )
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.startswith(_TRACKERS[0])
        & ~p.startswith(_TRACKERS[1])
        & ~p.startswith(_TRACKERS[2]),
    )
    q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def url_host(url_canon: Column) -> Column:
    """Host of an already-canonical URL (port already stripped)."""
    return F.regexp_extract(url_canon, r"^[a-z][a-z0-9+.\-]*://([^/?#:]*)", 1)


def crawl_url_dedup(
    df: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """Canonicalize and mark, per canonical URL, the winning fetch
    (minimum id — deterministic).  Adds ``url_canon`` and ``is_winner``;
    one hash-aggregate shuffle on the canonical key."""
    out = df.withColumn("url_canon", canonicalize_url(F.col(url_col)))
    w = Window.partitionBy("url_canon")
    return out.withColumn(
        "is_winner", F.col(id_col) == F.min(id_col).over(w)
    )


def cap_per_domain(
    df: DataFrame, url_canon_col: str, id_col: str, cap: int
) -> DataFrame:
    """Keep at most ``cap`` rows per host, chosen by portable-hash order
    (reproducible cross-engine).  One window shuffle partitioned by
    host; rank columns are dropped so the output is cap-invariant."""
    host = url_host(F.col(url_canon_col))
    ranked = (
        df.withColumn("host", host)
        .withColumn("_hk", portable_hash60(F.col(id_col).cast("string")))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("host").orderBy("_hk", id_col)
            ),
        )
    )
    return ranked.filter(F.col("_rn") <= cap).drop("_hk", "_rn")
