"""robots.txt crawl-policy filtering — the admission-control step of a
crawl corpus: before a fetched URL enters the training set, the host's
robots rules decide whether the crawler was allowed there at all.

Core-standard semantics (RFC 9309): within the user-agent group, every
rule whose path is a PREFIX of the URL path matches; the LONGEST match
wins; on a length tie, Allow wins; no match → allowed.  (Wildcard
extensions are out of scope here — the prefix core is what the RFC
mandates.)

Scale shape: the rule table is robots.txt-sized (KBs per host) →
broadcast; the URL table is the 100 TB side and takes one
prefix-match join + one per-URL window over its few matching rules.
No shuffle of the corpus beyond the verdict window's hash partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    *,
    id_col: str,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Adds ``allowed`` (boolean) and ``rule`` (winning pattern or NULL)
    to ``urls``.

    ``rules`` columns: ``host``, ``pattern`` (path prefix), ``allow``
    (boolean).  Longest-prefix-wins, Allow beats Disallow on ties,
    default allow.  The verdict window partitions on ``id_col`` (the
    URL row's identity — NOT (host, path), which may repeat across
    rows)."""
    r = rules.select(
        F.col("host").alias("__rh"),
        F.col("pattern").alias("rule"),
        F.col("allow").alias("__ra"),
        F.length("pattern").alias("__rl"),
    )
    matched = urls.join(
        F.broadcast(r),
        (F.col(host_col) == F.col("__rh"))
        & F.col(path_col).startswith(F.col("rule")),
        "left",
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__rl").desc_nulls_last(),
        F.col("__ra").desc_nulls_last(),
        F.col("rule").asc_nulls_last(),
    )
    best = matched.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    return best.withColumn(
        "allowed", F.coalesce(F.col("__ra"), F.lit(True))
    ).drop("__rh", "__ra", "__rl", "__rn")
