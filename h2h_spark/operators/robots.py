"""robots.txt crawl-policy filtering — the admission-control step of a
crawl corpus: before a fetched URL enters the training set, the host's
robots rules decide whether the crawler was allowed there at all.

Full RFC 9309 matching semantics: within the user-agent group, a rule
matches when its pattern matches a prefix of the URL path, where ``*``
matches any sequence of characters and a terminal ``$`` anchors the
pattern to the end of the path (§2.2.3 special characters); the MOST
SPECIFIC match wins — most octets in the pattern (§2.2.2) — and on a
length tie, Allow wins; no match → allowed.

Scale shape: the rule table is robots.txt-sized (KBs per host) →
broadcast, and its pattern→regex compilation happens on that tiny side;
the URL table is the 100 TB side and takes one match join + one per-URL
window over its few matching rules.  Plain prefix rules (no ``*``/``$``,
the overwhelming majority in real robots files) keep the cheap
``startswith`` path; only wildcard rules evaluate a regex.  No shuffle
of the corpus beyond the verdict window's hash partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _pattern_regex(pattern):
    """Rule pattern → anchored Java regex (computed on the broadcast rule
    side): every regex metachar is escaped, then the RFC's two special
    characters are re-introduced — ``*`` → ``.*`` anywhere, ``$`` → end
    anchor when terminal (a mid-pattern ``$`` stays literal, §2.2.3)."""
    rx = F.regexp_replace(pattern, r"([.^$*+?()\[\]{}|\\])", r"\\$1")
    rx = F.regexp_replace(rx, r"\\\*", ".*")
    rx = F.regexp_replace(rx, r"\\\$$", r"\$")
    return F.concat(F.lit("^"), rx)


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

    ``rules`` columns: ``host``, ``pattern`` (path pattern, ``*``/``$``
    per RFC 9309 §2.2.3), ``allow`` (boolean).  Most-specific
    (longest-pattern) match wins, Allow beats Disallow on ties, default
    allow.  The verdict window partitions on ``id_col`` (the URL row's
    identity — NOT (host, path), which may repeat across rows)."""
    has_wild = F.col("pattern").contains("*") | F.col("pattern").endswith("$")
    r = rules.select(
        F.col("host").alias("__rh"),
        F.col("pattern").alias("rule"),
        F.col("allow").alias("__ra"),
        F.length("pattern").alias("__rl"),
        has_wild.alias("__rw"),
        _pattern_regex(F.col("pattern")).alias("__rx"),
    )
    matched = urls.join(
        F.broadcast(r),
        (F.col(host_col) == F.col("__rh"))
        & F.when(
            F.col("__rw"), F.regexp_like(F.col(path_col), F.col("__rx"))
        ).otherwise(F.col(path_col).startswith(F.col("rule"))),
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
    ).drop("__rh", "__ra", "__rl", "__rn", "__rw", "__rx")
