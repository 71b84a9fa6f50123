"""Event-sequence analytics: next-event transition matrices and top
session paths (engine extension, SURVEY.md §2.3 — the clickstream /
behavioral side of the event-time family, next to funnels and
sessionization in :mod:`h2h_spark.operators.timeseries`).

Both operators shuffle the event stream ONCE, on the user key, and do
every sequence step inside that partitioning with window functions; the
outputs are |event-type|²- and path-vocabulary-sized — tiny relative to
the input, which is what makes them runnable as corpus-wide reports at
100 TB.  Ordering ties are broken by the event id everywhere, so results
are deterministic and bit-identical to the serial SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["event_transitions", "top_paths"]


def event_transitions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    ``(cur_event, next_event, n, p)`` where ``p`` is the row-normalized
    transition probability, rounded to 4 digits.

    One user-keyed shuffle feeds the ``lead`` window; the pair counts and
    row totals are |types|²-bounded aggregates (the total re-uses a
    window over the already-tiny count table, not a second pass over the
    events).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        df.select(
            F.col(type_col).alias("cur_event"),
            F.lead(type_col).over(w).alias("next_event"),
        )
        .filter(F.col("next_event").isNotNull())
    )
    counts = pairs.groupBy("cur_event", "next_event").agg(
        F.count("*").cast("bigint").alias("n")
    )
    tot = Window.partitionBy("cur_event")
    return counts.select(
        "cur_event",
        "next_event",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 4).alias("p"),
    )


def top_paths(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    *,
    gap_minutes: int = 30,
    depth: int = 3,
    k: int = 10,
) -> DataFrame:
    """Most common session-opening paths: sessionize on an inactivity
    gap, join each session's first ``depth`` event types with ``>``, and
    return the ``k`` most frequent paths ``(path, n)`` (count desc, path
    asc — deterministic).

    All three windows (session break, running session id, in-session
    rank) share the single user-keyed sort, so the plan carries ONE
    shuffle of the events; the path table is vocabulary^depth-bounded and
    the top-k is TakeOrdered.  Sessions shorter than ``depth`` contribute
    their full (shorter) path — a report over all sessions, not only long
    ones.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_us = F.unix_micros(F.col(ts_col)) - F.lag(
        F.unix_micros(F.col(ts_col))
    ).over(w)
    new_s = (gap_us.isNull() | (gap_us > gap_minutes * 60 * 1_000_000)).cast("int")
    sess = (
        df.withColumn("__new", new_s)
        .withColumn("__sess", F.sum("__new").over(w))
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy(user_col, "__sess").orderBy(ts_col, id_col)
        ))
        .filter(F.col("__rn") <= depth)
    )
    paths = (
        sess.groupBy(user_col, "__sess")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__rn"), F.col(type_col).alias("t")))
                    ),
                    lambda s: s.getField("t"),
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(k)
    )


def last_touch_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    *,
    conversion: str,
) -> DataFrame:
    """Last-touch conversion attribution: each ``conversion`` event is
    credited to the user's most recent PRECEDING non-conversion event
    type (``'(none)'`` when the conversion is the user's first activity).
    Returns ``(channel, n_conversions)``.

    One user-keyed shuffle; the credited channel is an ignore-nulls
    ``last`` over the unbounded-preceding-to-1-preceding frame riding
    that sort — no self-join, no per-conversion rescan.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.last(
        F.when(F.col(type_col) != conversion, F.col(type_col)),
        ignorenulls=True,
    ).over(w)
    return (
        df.withColumn("__ch", prev)
        .filter(F.col(type_col) == conversion)
        .select(F.coalesce(F.col("__ch"), F.lit("(none)")).alias("channel"))
        .groupBy("channel")
        .agg(F.count("*").cast("bigint").alias("n_conversions"))
    )


def sequence_pattern_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    event_col: str,
    pattern: str,
    *,
    alphabet: dict[str, str] | None = None,
) -> DataFrame:
    """Regex pattern mining over per-key event SEQUENCES — the
    MATCH_RECOGNIZE shape: encode each key's time-ordered events as a
    character string (one char per event type), then count
    non-overlapping regex matches.  ``(key, seq_len, n_matches)``.

    The encode step is one grouping shuffle (collect_list + sort_array
    on a (ts, tiebreak, char) struct — deterministic total order); the
    regex runs once per KEY on a compact string, not per event.  A key's
    sequence must fit in memory — true for behavioral sessions;
    sessionize first when keys are unbounded.

    ``alphabet`` maps event values to single chars; default: first
    letter."""
    if alphabet is not None:
        c = F.col(event_col)
        enc = F.lit(None).cast("string")
        expr = None
        for k, v in alphabet.items():
            expr = F.when(c == k, v) if expr is None else expr.when(c == k, v)
        enc = expr.otherwise(F.lit("?"))
    else:
        enc = F.substring(F.col(event_col), 1, 1)
    rows = df.select(
        F.col(key_col).alias("key"),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(tiebreak_col).alias("tb"),
            enc.alias("c"),
        ).alias("e"),
    )
    seqs = rows.groupBy("key").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("e")), lambda s: s.getField("c")
            ),
            "",
        ).alias("seq")
    )
    return seqs.select(
        "key",
        F.length("seq").cast("bigint").alias("seq_len"),
        F.regexp_count("seq", F.lit(pattern)).cast("bigint").alias("n_matches"),
    )
