"""Streaming windowed aggregation + batch sessionization helpers."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def run_windowed_counts(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    ts_col: str,
    key_col: str,
    window_duration: str = "1 hour",
    transform=None,
) -> DataFrame:
    """Run a tumbling-window count as a real Structured Streaming job over a
    file source and return the final (complete-mode) result as a batch
    DataFrame.

    Uses the memory sink + ``processAllAvailable`` so a bounded input drives
    the streaming engine to completion synchronously; on a cluster the same
    plan runs continuously from kafka/files with a watermark + append mode.
    """
    name = f"h2h_stream_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(schema).parquet(path)
    if transform is not None:
        stream = transform(stream)
    agg = (
        stream.groupBy(F.window(ts_col, window_duration), key_col)
        .count()
        .select(
            F.col("window.start").alias("window_start"),
            F.col(key_col),
            F.col("count"),
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def sessionize(
    df: DataFrame, user_col: str, ts_col: str, gap_seconds: int = 1800
) -> DataFrame:
    """Batch sessionization: gap > threshold starts a new session (the
    classic lag + cumulative-sum construction; streaming equivalent is
    ``session_window``)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    return (
        df.withColumn("_new_session", (gap.isNull() | (gap > gap_seconds)).cast("int"))
        .withColumn("session_id", F.sum("_new_session").over(w))
        .drop("_new_session")
    )


def run_session_counts(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    transform=None,
    shuffle_partitions: int | None = 4,
) -> DataFrame:
    """Streaming sessionization via ``session_window`` (the native
    merging-session-window state operator): per (key, session) row with
    session start / end (= last event + gap) and event count.

    Complete mode (update is rejected for merging session windows —
    Spark can't retract an already-emitted partial session) + a bounded
    input means the final table holds every session's final aggregate —
    equal to the batch gap-sessionization, hence oracle-checkable.  On a
    cluster the production shape is append mode: sessions emit once the
    watermark passes their end, and state for closed sessions is freed.

    ``shuffle_partitions`` sizes the session-state stores through a child
    session (see ``windowed_stream_join`` — store count scales with
    shuffle partitions, not data)."""
    name = f"h2h_sess_{uuid.uuid4().hex[:8]}"
    if shuffle_partitions is not None:
        spark = spark.newSession()
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    stream = spark.readStream.schema(schema).parquet(path)
    if transform is not None:
        stream = transform(stream)
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
