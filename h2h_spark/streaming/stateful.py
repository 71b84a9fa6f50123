"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming surface at all (SURVEY.md §1.5); this is
engine extension built on Structured Streaming's arbitrary-state API.
Pattern: state is a small per-key tuple, updates are Arrow-batched, the
operator emits deltas (append mode) — the shape that scales to a keyed
100 TB stream because state lives in the state store, partitioned by key.
"""

from __future__ import annotations

import uuid
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    key_col: str,
    value_col: str,
    transform=None,
) -> DataFrame:
    """Streaming per-key running totals with explicit state: emits one row
    per (key, batch) carrying the cumulative count/sum so far.  Returns the
    materialized result after draining the bounded input."""

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.DoubleType()),
        ]
    )

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total": [s]})

    name = f"h2h_state_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(schema).parquet(path)
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
