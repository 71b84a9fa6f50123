"""Interval (range) join — points against time intervals, per key.

Spark has no native interval join: the naive formulation
(``l.key = r.key AND l.ts BETWEEN r.start AND r.end``) planes the range
predicate as a join *filter*, fine on an equi-keyed join but degenerating
to BroadcastNestedLoop/Cartesian when the key is absent or low-cardinality.
The scalable construction here is bucketed equi-join (the standard trick
in KDB/Flink/DuckDB's range join literature): quantize time into
``bucket_sec`` buckets, explode each interval over the buckets it covers,
bucket each point once, equi-join on (key, bucket), then apply the exact
range predicate.  Both sides shuffle once on (key, bucket) — a normal
hash join; the only amplification is interval_span / bucket_sec rows per
interval, a knob the caller sizes to the workload (amplification ~8 for
7-day spans on daily buckets).

A point lies in exactly one bucket and an interval covers each of its
buckets once, so the join emits each qualifying (point, interval) pair
exactly once — no post-dedup needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from h2h_spark.operators.timeseries import _epoch_seconds


def point_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    key: str,
    point_ts: str,
    start_ts: str,
    span_sec: int,
    bucket_sec: int = 86400,
) -> DataFrame:
    """Inner-join each point to the intervals ``[start, start +
    span_sec)`` of the same ``key`` that contain it — each qualifying
    pair exactly once.  For interval-preserving aggregates (counts with
    zeros), aggregate this result and outer-join it back to the interval
    table: a left join through the bucket explosion would emit spurious
    NULL rows for every non-matching bucket of a partially-matched
    interval.

    Column names must be disjoint apart from ``key``; the result carries
    all columns of both inputs.
    """
    clash = (set(points.columns) & set(intervals.columns)) - {key}
    if clash:
        raise ValueError(f"overlapping non-key columns: {sorted(clash)}")
    psec = _epoch_seconds(F.col(point_ts), dict(points.dtypes)[point_ts])
    isec = _epoch_seconds(F.col(start_ts), dict(intervals.dtypes)[start_ts])
    p = points.withColumn("__pb", F.floor(psec / bucket_sec).cast("bigint")).withColumn(
        "__ps", psec
    )
    b0 = F.floor(isec / bucket_sec).cast("bigint")
    b1 = F.floor((isec + span_sec) / bucket_sec).cast("bigint")
    i = (
        intervals.withColumn("__is", isec)
        .withColumn("__pb", F.explode(F.sequence(b0, b1)))
    )
    joined = i.join(p, [key, "__pb"], "inner").filter(
        (F.col("__ps") >= F.col("__is"))
        & (F.col("__ps") < F.col("__is") + span_sec)
    )
    return joined.drop("__pb", "__ps", "__is")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_start: str,
    left_span_sec: int,
    right_start: str,
    right_span_sec: int,
    bucket_sec: int = 86400,
) -> DataFrame:
    """Inner-join the interval sets ``[left_start, +left_span)`` x
    ``[right_start, +right_span)`` per ``key`` on OVERLAP
    (``ls < re AND rs < le``) — each qualifying pair exactly once,
    without a post-join dedup shuffle.

    Same bucketed construction as :func:`point_interval_join`, plus the
    standard once-only trick for interval-interval joins: both sides
    explode over their covering buckets, but a joined pair is KEPT only
    in the bucket containing the overlap's start ``max(ls, rs)`` — a
    bucket both sides provably cover (it is >= each side's start and <
    each side's end), so every overlapping pair survives in exactly one
    bucket.  One (key, bucket) hash shuffle per side; amplification =
    span/bucket rows per interval, the caller's knob.
    """
    clash = (set(left.columns) & set(right.columns)) - {key}
    if clash:
        raise ValueError(f"overlapping non-key columns: {sorted(clash)}")
    lsec = _epoch_seconds(F.col(left_start), dict(left.dtypes)[left_start])
    rsec = _epoch_seconds(F.col(right_start), dict(right.dtypes)[right_start])

    def explode_side(df, sec, span, s_name, e_name):
        s = sec
        e = sec + F.lit(float(span))
        b0 = F.floor(s / bucket_sec).cast("bigint")
        b1 = F.floor(e / bucket_sec).cast("bigint")
        return df.withColumn(s_name, s).withColumn(e_name, e).withColumn(
            "__bkt", F.explode(F.sequence(b0, b1))
        )

    l = explode_side(left, lsec, left_span_sec, "__ls", "__le")
    r = explode_side(right, rsec, right_span_sec, "__rs", "__re")
    ov_start = F.greatest(F.col("__ls"), F.col("__rs"))
    out = (
        l.join(r, [key, "__bkt"])
        .where(
            (F.col("__ls") < F.col("__re"))
            & (F.col("__rs") < F.col("__le"))
            & (F.floor(ov_start / bucket_sec).cast("bigint") == F.col("__bkt"))
        )
    )
    return out.drop("__bkt", "__ls", "__le", "__rs", "__re")
