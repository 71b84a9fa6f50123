"""foreachBatch sinks — the production pattern for streaming writes Spark
has no native sink for (upserts, aggregate folds, multi-table writes).

`stream_fold_agg` maintains a continuous aggregate: each micro-batch is
partially aggregated (|batch| work), then folded into the stored per-key
state via the mergeable-state contract of
:mod:`h2h_spark.operators.incremental` — per-batch cost |state|+|batch|,
never the history.  State versions are whole-directory swaps
(write-new-then-repoint), the idempotent pattern for object stores: a
failed batch leaves the previous version intact and micro-batch replay
just rewrites the same version.

Decimal accumulation makes the fold order-independent, so the final state
equals the one-shot batch aggregate no matter how the input was split
into micro-batches — the property the oracle asserts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def stream_fold_agg(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    keys: list[str],
    measures: dict[str, str],
    state_root: str,
    transform=None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drain the bounded file stream at ``src_dir`` through foreachBatch,
    folding each micro-batch into the versioned aggregate state under
    ``state_root``; returns the final state."""
    from h2h_spark.operators.incremental import agg_state, merge_agg_state

    cur = {"path": None, "v": 0, "schema": None}

    def fold(batch: DataFrame, _bid: int) -> None:
        part = agg_state(batch, keys, measures)
        if cur["path"] is not None:
            # pinned state schema: skips a per-batch parquet footer-
            # inference pass (round 14)
            prev = spark.read.schema(cur["schema"]).parquet(cur["path"])
            part = merge_agg_state(prev, part, keys)
        cur["v"] += 1
        path = os.path.join(state_root, f"v{cur['v']}")
        part.write.mode("overwrite").parquet(path)
        cur["path"] = path
        cur["schema"] = part.schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(src_dir)
    )
    if transform is not None:
        stream = transform(stream)
    q = stream.writeStream.foreachBatch(fold).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    if cur["path"] is None:  # empty input: state is the empty aggregate
        return agg_state(
            spark.createDataFrame([], schema), keys, measures
        )
    return spark.read.parquet(cur["path"])


def stream_dq_gate(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    constraints,
    referential=None,
    transform=None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Continuous data-quality gate: every micro-batch runs the
    :mod:`h2h_spark.operators.quality` constraint suite (one wide
    aggregate per batch) and the O(|constraints|) violation counts fold
    additively into driver-side totals — so the final report equals the
    batch suite over all data regardless of micro-batch boundaries (the
    property the oracle asserts).  Per-batch cost is |batch| scan work;
    gate state never grows with history."""
    from h2h_spark.operators.quality import check_constraints

    # Only row-additive constraints fold correctly across micro-batches:
    # a `unique` check counts duplicates within each batch only, so a
    # duplicate pair split across two batches would be silently missed
    # and the gate would report passed=true on non-unique data.  Reject
    # it loudly; uniqueness over a stream needs accumulated state (use
    # the batch suite on the landed data, or stream_dedup upstream).
    non_additive = [c.name for c in constraints if c.kind == "unique"]
    if non_additive:
        raise ValueError(
            "stream_dq_gate supports only row-additive constraint kinds "
            "(not_null/in_range/matches/predicate); `unique` cannot be "
            f"folded across micro-batches: {non_additive}"
        )

    totals: dict[str, int] = {}

    def fold(batch: DataFrame, _bid: int) -> None:
        rep = check_constraints(batch, constraints, referential=referential)
        for r in rep.collect():
            totals[r["check_name"]] = (
                totals.get(r["check_name"], 0) + int(r["violations"])
            )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(src_dir)
    )
    if transform is not None:
        stream = transform(stream)
    q = stream.writeStream.foreachBatch(fold).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = [(k, v, v == 0) for k, v in sorted(totals.items())]
    return spark.createDataFrame(
        rows, "check_name string, violations bigint, passed boolean"
    )


def idempotent_append(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    out_root: str,
    transform=None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Exactly-once file sink: each micro-batch commits to its own
    ``batch=<id>`` directory with a marker written LAST — a replayed
    batch id (failure recovery re-delivers micro-batches with the same
    id) sees the marker and skips, so reprocessing appends nothing
    twice.  This is the idempotent-by-batch-id contract Structured
    Streaming's foreachBatch documentation prescribes, as an operator.
    Returns the deduplicated union of all committed batches."""
    import shutil

    def commit(batch: DataFrame, bid: int) -> None:
        dst = os.path.join(out_root, f"batch={bid}")
        marker = os.path.join(dst, "_COMMITTED")
        if os.path.exists(marker):
            return  # exactly-once: this batch id already landed
        if os.path.exists(dst):  # partial write from a dead attempt
            shutil.rmtree(dst)
        batch.write.mode("overwrite").parquet(dst)
        open(marker, "w").close()

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(src_dir)
    )
    if transform is not None:
        stream = transform(stream)
    q = stream.writeStream.foreachBatch(commit).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # Zero micro-batches (empty src dir) means no batch=* directory was
    # committed; reading the empty root would raise AnalysisException.
    committed = [
        d for d in (os.listdir(out_root) if os.path.isdir(out_root) else [])
        if d.startswith("batch=")
    ]
    if not committed:
        # Match the non-empty path's schema: the transform may project or
        # add columns, so derive it from an empty transformed frame rather
        # than the raw source schema.
        empty = spark.createDataFrame([], schema)
        if transform is not None:
            empty = transform(empty)
        return empty
    return spark.read.parquet(out_root).drop("batch")


def stream_tdigest_agg(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    value_col: str,
    group_cols: list[str],
    state_root: str,
    compression: float = 200.0,
    weight_col: str | None = None,
    transform=None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Continuous per-group (optionally importance-WEIGHTED) quantile
    sketch: each micro-batch folds into a stored t-digest centroid
    table.

    The digest's mergeability is exactly what makes it the right
    streaming state: per batch we build map-side partial digests over
    the BATCH only (|batch| work, raw values never shuffle), union them
    with the stored centroids, and re-compress per group
    (:func:`h2h_spark.operators.sketch.tdigest_merge_centroids`) — so
    state stays O(groups x compression) forever while summarizing the
    whole history.  Per-batch cost is |batch| + |state|, never the
    history; the raw stream is never retained.  State versions are
    whole-directory swaps like :func:`stream_fold_agg` (idempotent
    under micro-batch replay).

    Returns the final centroid table ``group_cols + (c_mean,
    c_weight)``; query it with
    :func:`h2h_spark.operators.sketch.tdigest_estimate`.
    """
    from h2h_spark.operators.sketch import (
        tdigest_merge_centroids,
        tdigest_partial,
    )

    cur = {"path": None, "v": 0, "schema": None}

    def fold(batch: DataFrame, _bid: int) -> None:
        part = tdigest_partial(
            batch, value_col, group_cols, compression, weight_col
        )
        if cur["path"] is not None:
            # state schema is known after the first fold — pinning it
            # skips a per-batch parquet footer-inference pass (round 14)
            prev = spark.read.schema(cur["schema"]).parquet(cur["path"])
            part = prev.unionByName(part)
        merged = tdigest_merge_centroids(part, group_cols, compression)
        cur["v"] += 1
        path = os.path.join(state_root, f"v{cur['v']}")
        merged.write.mode("overwrite").parquet(path)
        cur["path"] = path
        cur["schema"] = merged.schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(src_dir)
    )
    if transform is not None:
        stream = transform(stream)
    q = stream.writeStream.foreachBatch(fold).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    if cur["path"] is None:  # empty input: no centroids
        from pyspark.sql import functions as F

        empty = spark.createDataFrame([], schema)
        if transform is not None:
            empty = transform(empty)
        return empty.select(
            *group_cols,
            F.lit(None).cast("double").alias("c_mean"),
            F.lit(None).cast("double").alias("c_weight"),
        )
    return spark.read.parquet(cur["path"])


def stream_late_router(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    ts_col: str,
    key_col: str,
    delay_sec: int,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Watermark-driven LATE-DATA QUARANTINE: Structured Streaming's
    native watermark silently DROPS late rows; production pipelines that
    must account for every record route them to a side output instead.
    This foreachBatch router reimplements the watermark contract
    explicitly so late rows stay observable:

    - watermark = (max event time over all COMPLETED batches) - delay;
      it advances only between batches, exactly like the engine's;
    - each arriving batch splits on ``ts < watermark`` — late rows are
      quarantined (counted per key; in production, appended to a side
      table), on-time rows fold into the running per-key counts;
    - per-batch cost is |batch|; router state is the scalar raw-max plus
      O(|keys|) counters (the bounded-driver-state pattern of
      :func:`stream_dq_gate`).

    Returns ``(key, n_on_time, n_late)`` per key.  The result depends on
    the file replay ORDER (that is what lateness means); drive it with a
    fixture whose file order is pinned (distinct mtimes).
    """
    from pyspark.sql import functions as F

    state = {"raw_max": None}
    totals: dict = {}

    def fold(batch: DataFrame, _bid: int) -> None:
        ts = F.col(ts_col).cast("double")
        wm = (
            None
            if state["raw_max"] is None
            else state["raw_max"] - float(delay_sec)
        )
        flagged = batch.select(
            F.col(key_col).alias("k"),
            (ts < F.lit(wm)).alias("late") if wm is not None
            else F.lit(False).alias("late"),
            ts.alias("__ts"),
        )
        agg = flagged.groupBy("k").agg(
            F.sum(F.when(~F.col("late"), 1).otherwise(0)).alias("on"),
            F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("late_n"),
            F.max("__ts").alias("mx"),
        )
        batch_max = None
        for r in agg.collect():
            on, lt = totals.get(r["k"], (0, 0))
            totals[r["k"]] = (on + int(r["on"]), lt + int(r["late_n"]))
            if r["mx"] is not None:
                batch_max = r["mx"] if batch_max is None else max(batch_max, r["mx"])
        if batch_max is not None:
            state["raw_max"] = (
                batch_max
                if state["raw_max"] is None
                else max(state["raw_max"], batch_max)
            )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(src_dir)
        .writeStream.foreachBatch(fold)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = [(k, on, lt) for k, (on, lt) in sorted(totals.items())]
    return spark.createDataFrame(
        rows, f"{key_col} string, n_on_time long, n_late long"
    )


def stream_quota_router(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    key_col: str,
    quota: int,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Per-key ADMISSION QUOTA across micro-batches — the streaming
    ingestion governor (cap what any one key/tenant/domain contributes
    to a live corpus).  foreachBatch keeps O(|keys|) admitted counters;
    each batch admits ``min(remaining_k, batch_count_k)`` per key and
    rejects the rest.  Cumulative admission is batching-invariant
    (min(quota, total)), which is exactly what makes the contract
    oracle-checkable while the MECHANISM — durable counters consulted
    and updated per micro-batch — is the production shape (in
    production the counters live in the checkpointed state store /
    an idempotent KV table).

    Returns ``(key, n_admitted, n_rejected)`` per key.
    """
    from pyspark.sql import functions as F

    admitted: dict = {}
    rejected: dict = {}

    def fold(batch: DataFrame, _bid: int) -> None:
        counts = batch.groupBy(F.col(key_col).alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        )
        for r in counts.collect():
            have = admitted.get(r["k"], 0)
            take = min(quota - have, int(r["c"]))
            take = max(take, 0)
            admitted[r["k"]] = have + take
            rejected[r["k"]] = rejected.get(r["k"], 0) + int(r["c"]) - take

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(src_dir)
        .writeStream.foreachBatch(fold)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = [
        (k, admitted.get(k, 0), rejected.get(k, 0))
        for k in sorted(set(admitted) | set(rejected))
    ]
    return spark.createDataFrame(
        rows, "key string, n_admitted bigint, n_rejected bigint"
    )


def stream_kmv_distinct(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    ts_col: str,
    key_col: str,
    *,
    k: int = 64,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Windowed APPROX-DISTINCT over a stream via mergeable KMV
    sketches: per hour-window, the state is the k smallest distinct
    portable hashes (O(windows·k) driver state; in production, the
    state store).  Each micro-batch contributes its own k-bounded
    per-window minima — KMV's merge IS min-merge, so the fold is
    batching-invariant and the final ESTIMATE (the
    `operators/sketch.kmv_distinct` formula: exact below k, else
    floor((k-1)·2^60/h_k)) is bit-gradeable by an external oracle —
    the same no-error-bound-hedging contract as the batch sketch.

    Returns ``(window_ts, est_distinct)``.
    """
    from pyspark.sql import functions as F

    state: dict = {}  # window epoch -> sorted list of <= k hashes

    def fold(batch: DataFrame, _bid: int) -> None:
        from h2h_spark.operators.dedup import portable_hash60
        from pyspark.sql.window import Window

        h = batch.select(
            F.date_trunc("hour", F.col(ts_col)).cast("long").alias("w"),
            portable_hash60(F.col(key_col).cast("string")).alias("hv"),
        ).distinct()
        rn = F.row_number().over(Window.partitionBy("w").orderBy("hv"))
        top = h.withColumn("__rn", rn).filter(F.col("__rn") <= k)
        for r in top.collect():
            cur = state.setdefault(r["w"], [])
            cur.append(r["hv"])
        for w in state:
            state[w] = sorted(set(state[w]))[:k]

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(src_dir)
        .writeStream.foreachBatch(fold)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    m = float(1 << 60)
    rows = []
    for w, hs in sorted(state.items()):
        if len(hs) < k:
            est = len(hs)
        else:
            import math

            est = math.floor(float(k - 1) * m / float(hs[k - 1]))
        rows.append((w, est))
    return spark.createDataFrame(rows, "window_ts bigint, est_distinct bigint")
