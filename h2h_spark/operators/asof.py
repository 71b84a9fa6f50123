"""As-of (temporal) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with
``right_ts <= left_ts`` per key (backward direction — the semantics of
DuckDB's ``ASOF JOIN``, kdb's ``aj``, pandas ``merge_asof``).

Implementation is the scalable union-sort-window construction, NOT a
range-expanded join: tag both inputs, union, and take the running
``last(right value, ignoreNulls)`` over a window partitioned by key and
ordered by (ts, tag) — right rows sort before left rows at equal
timestamps, so the match is inclusive.  Cost: one shuffle on the key +
a per-partition sort — the same shape as a regular sort-merge join, with
no blow-up on dense right sides (a filter+groupBy-max formulation would
materialize every qualifying pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of left join.

    Returns every ``left`` row plus, for each name in ``value_cols``, the
    value from the latest ``right`` row whose ``right_ts <= left_ts`` for
    the same key (NULL when no such row exists).
    """
    from pyspark.sql import types as T

    lcols = left.columns
    clash = set(lcols) & set(value_cols)
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} collide with left columns — rename "
            "one side before the as-of join"
        )
    # The right row travels as ONE struct, so ``last(..., ignoreNulls)``
    # skips only rows with no right match at all — a right row whose value
    # column is genuinely NULL is still the match and its NULL is attached
    # as-is (DuckDB ASOF JOIN / pandas merge_asof semantics).  The struct is
    # also the deterministic tiebreak among right rows at an equal
    # (key, ts): the window orders by it, so ``last`` is the max struct.
    rfields = {f.name: f.dataType for f in right.schema.fields}
    rstruct_type = T.StructType(
        [T.StructField(c, rfields[c]) for c in value_cols]
    )
    l = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rstruct_type).alias("__rv"),
    )
    r = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in value_cols]).alias("__rv"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__side", "__rv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__rv", F.last("__rv", ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__rv.{c}").alias(c) for c in value_cols],
    )
