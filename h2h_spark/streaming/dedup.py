"""Streaming deduplication — exactly-once semantics over unbounded input.

The batch dedup operators (:mod:`h2h_spark.operators.dedup`) assume a
bounded corpus; a streaming ingest pipeline needs dedup state that ages
out.  ``dropDuplicatesWithinWatermark`` keeps per-key state only within
the watermark horizon — bounded state for unbounded streams, the shape a
100 TB/day feed requires (exact global dedup over an unbounded stream is
unbounded state by definition).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def dedup_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "1 hour",
    transform=None,
) -> DataFrame:
    """Run a watermarked streaming dedup over a bounded file input and
    return the surviving rows.

    Duplicates of a key arriving within ``watermark`` of each other are
    dropped; state for a key is released once the watermark passes it.
    """
    name = f"h2h_dedup_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(schema).parquet(path)
    if transform is not None:
        stream = transform(stream)
    deduped = stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
