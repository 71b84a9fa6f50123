"""As-of (temporal) join — an operator Spark lacks natively.

For each left row, attach the nearest right row per key: backward
(``right_ts <= left_ts``, the semantics of DuckDB's ``ASOF JOIN``, kdb's
``aj``, pandas ``merge_asof``), or forward (``right_ts >= left_ts``,
pandas ``direction='forward'``), optionally bounded by a ``tolerance``.

Implementation is the scalable union-sort-window construction, NOT a
range-expanded join: tag both inputs, union, and take the running
``last(right value, ignoreNulls)`` over a window partitioned by key and
ordered by (ts, tag) — right rows sort before left rows at equal
timestamps, so the match is inclusive.  Cost: one shuffle on the key +
a per-partition sort — the same shape as a regular sort-merge join, with
no blow-up on dense right sides (a filter+groupBy-max formulation would
materialize every qualifying pair).  Forward direction is the same scan
with the timestamp order reversed; tolerance is a post-hoc null-out of
matches farther than the bound (the nearest match being out of range
means every other candidate is too — no second pass needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of left join.

    Returns every ``left`` row plus, for each name in ``value_cols``, the
    value from the nearest ``right`` row for the same key — the latest
    with ``right_ts <= left_ts`` (backward, default) or the earliest with
    ``right_ts >= left_ts`` (forward); NULL when no such row exists.
    ``tolerance`` (seconds) additionally requires the matched timestamps
    to be within the bound, like pandas ``merge_asof(tolerance=...)``.
    """
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
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
    # Its first field is the right timestamp (needed for the tolerance
    # check); at an equal (key, ts) that field ties, so the value-column
    # tiebreak is unchanged.
    rfields = {f.name: f.dataType for f in right.schema.fields}
    rstruct_type = T.StructType(
        [T.StructField("__rts", rfields[right_ts])]
        + [T.StructField(c, rfields[c]) for c in value_cols]
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
        F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c) for c in value_cols]
        ).alias("__rv"),
    )
    u = l.unionByName(r)
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__key")
        .orderBy(ts_order, F.col("__side").asc(), F.col("__rv").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__rv", F.last("__rv", ignorenulls=True).over(w))
    if tolerance is not None:
        # TIMESTAMP_NTZ has no direct double cast; route through TIMESTAMP
        # (session tz is fixed to UTC by the engine) — a no-op for plain
        # timestamps, identity-preserving for numeric ts columns.
        def _seconds(c: Column, dtype: str) -> Column:
            if dtype.startswith("timestamp"):
                return c.cast("timestamp").cast("double")
            return c.cast("double")

        lsec = _seconds(F.col("__ts"), dict(left.dtypes)[left_ts])
        rsec = _seconds(F.col("__rv.__rts"), rstruct_type["__rts"].dataType.simpleString())
        diff = (lsec - rsec) if direction == "backward" else (rsec - lsec)
        u = u.withColumn("__rv", F.when(diff <= F.lit(float(tolerance)), F.col("__rv")))
    return u.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__rv.{c}").alias(c) for c in value_cols],
    )
