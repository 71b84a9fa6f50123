"""CDC / event-log ordering audit — per-key arrival-order vs
event-time consistency checks.

A change-data-capture feed (or any at-least-once event log) carries two
orders: the ARRIVAL order (the log sequence — here a monotonically
assigned id) and the EVENT-TIME order (the ``ts`` each record claims).
Downstream consumers that fold state in arrival order silently corrupt
state when event time regresses — the audit every CDC pipeline runs
before trusting a feed is "per key, walk the log in arrival order and
measure how often and how far event time goes backwards".

Spark-first shape: ONE hash shuffle on the key for the window sort, a
``lag`` over (key, seq) — no self-join, no collect.  All metrics are
per-key aggregates of the lag deltas, so the whole audit is a window +
groupBy pipeline that whole-stage-codegens; at 100 TB the cost is the
one keyed sort-shuffle any per-key sessionization already pays.

Reported per key:
- ``n_rows``       log records for the key
- ``n_regressions``arrival-adjacent pairs where event time went backwards
- ``max_backstep_sec`` the largest backwards jump in seconds
- ``n_ties``       arrival-adjacent pairs with identical event time
                   (ordering within them is undefined for consumers)
- ``out_of_order_frac`` regressions / adjacent pairs, the feed-health
                   number dashboards track (0.0 for single-row keys)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def order_audit(
    df: DataFrame,
    key_col: str,
    seq_col: str,
    ts_col: str,
) -> DataFrame:
    """Per-key event-time ordering audit over arrival order (see module
    docstring).  One window shuffle on ``key_col``."""
    w = Window.partitionBy(key_col).orderBy(seq_col)
    prev = F.lag(F.col(ts_col)).over(w)
    step = F.col(ts_col).cast("double") - prev.cast("double")
    lagged = df.select(
        F.col(key_col).alias("key"),
        step.alias("step"),
    )
    n_adj = F.sum(F.when(F.col("step").isNotNull(), 1).otherwise(0))
    n_reg = F.sum(F.when(F.col("step") < 0, 1).otherwise(0))
    return lagged.groupBy("key").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        n_reg.cast("bigint").alias("n_regressions"),
        F.coalesce(
            -F.min(F.when(F.col("step") < 0, F.col("step"))), F.lit(0.0)
        ).alias("max_backstep_sec"),
        F.sum(F.when(F.col("step") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_ties"),
        F.when(n_adj > 0, F.round(n_reg / n_adj, 6))
        .otherwise(F.lit(0.0))
        .alias("out_of_order_frac"),
    )
