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


def hysteresis_alarm_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    key_col: str,
    seq_col: str,
    value_col: str,
    *,
    lo: float,
    hi: float,
    transform=None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Arbitrary per-key STATE MACHINE over a stream — the shape
    ``applyInPandasWithState`` exists for and no built-in operator
    expresses: a two-state hysteresis alarm (enter alarm when the value
    crosses above ``hi``, leave when it crosses below ``lo``, HOLD the
    current mode in between) that emits one row per TRANSITION only.
    The mode after any prefix depends on the entire per-key history, so
    state must survive micro-batch boundaries — exactly what the state
    store provides; with ``max_files_per_trigger=1`` each input file
    replays as its own micro-batch and the machine's continuity across
    batches is the property under test.

    Per group-batch the fold is vectorized (no per-row Python): the
    crossing signal is NaN where the value holds, forward-filled and
    seeded with the stored mode — transitions are where the filled
    signal differs from its shift.  State is one small tuple per key in
    the partitioned state store, so a 100 TB keyed stream scales by key
    count, not event count.

    Emits ``(key, seq, mode)`` rows in append mode and returns the
    materialized result after draining the bounded input."""
    name = f"h2h_state_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )
    if transform is not None:
        stream = transform(stream)
    q = (
        hysteresis_alarm_transform(
            stream, key_col, seq_col, value_col, lo=lo, hi=hi
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


def hysteresis_alarm_transform(
    stream: DataFrame,
    key_col: str,
    seq_col: str,
    value_col: str,
    *,
    lo: float,
    hi: float,
) -> DataFrame:
    """The SOURCE-AGNOSTIC state-machine transform behind
    :func:`hysteresis_alarm_stream`: takes any streaming DataFrame
    (file replay, a live ``rate`` source, a message bus) and returns
    the transition-only streaming DataFrame — the caller picks the
    sink and trigger.  Separated so the same operator verified against
    the replayable file fixture also runs against genuinely unbounded
    sources (see the live rate-source test)."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField(seq_col, T.LongType()),
            T.StructField("mode", T.IntegerType()),
        ]
    )
    state_schema = T.StructType([T.StructField("mode", T.IntegerType())])

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        seed = state.get[0] if state.exists else 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        # one micro-batch may bundle several files' rows for this key:
        # the seq column defines event order within the batch
        rows = rows.sort_values(seq_col, ignore_index=True)
        vals = rows[value_col].to_numpy()
        sig = np.where(vals > hi, 1.0, np.where(vals < lo, 0.0, np.nan))
        mode = pd.Series(sig).ffill().fillna(float(seed))
        prev = mode.shift(1, fill_value=float(seed))
        hit = (mode != prev).to_numpy()
        state.update((int(mode.iloc[-1]) if len(mode) else seed,))
        if hit.any():
            yield pd.DataFrame(
                {
                    key_col: np.full(int(hit.sum()), key[0], dtype=np.int64),
                    seq_col: rows[seq_col].to_numpy()[hit],
                    "mode": mode.to_numpy()[hit].astype(np.int32),
                }
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
