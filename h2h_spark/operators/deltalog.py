"""Log-structured table state — the lakehouse commit-log pattern
(public: Delta Lake PROTOCOL.md; Iceberg's snapshot model is the same
idea with Avro manifests).  A table directory carries a
``_log/NNNNNNNNNN.json`` sequence; each commit is a file of JSON-line
ACTIONS (``{"add": {"path", "size", "numRecords", "minKey",
"maxKey"}}`` / ``{"remove": {"path"}}``).  The LIVE file set at
version V is the fold of all actions with version ≤ V, last action per
path wins — which is exactly one window/aggregate over the action
rows, no driver loop.

Scale shape: the log is metadata-sized (actions, not data); state
reconstruction shuffles only (path, version) tuples.  Time travel =
changing a filter predicate.  Zone-map pruning off the add-action
stats (minKey/maxKey) drops dead files BEFORE any scan task launches —
the planner reads the log, never the parquet, to decide what to read
(the `bloomidx` discipline applied to a versioned table).

Loud failures: gaps in the commit sequence (a missing version means an
incomplete copy — silently folding over it would resurrect removed
files), malformed actions, adds without stats when pruning is
requested.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG_DIR = "_log"


def write_commit(table_dir: str, version: int, actions: list[dict]) -> None:
    """Append one commit file (fixture/interop writer).  Actions are
    dicts with exactly one of ``add`` / ``remove``."""
    log = os.path.join(table_dir, _LOG_DIR)
    os.makedirs(log, exist_ok=True)
    p = os.path.join(log, f"{version:010d}.json")
    with open(p, "w") as f:
        for a in actions:
            if ("add" in a) == ("remove" in a):
                raise ValueError(f"action must have exactly one of "
                                 f"add/remove: {a}")
            f.write(json.dumps(a, sort_keys=True) + "\n")


def read_log(spark: SparkSession, table_dir: str) -> DataFrame:
    """All actions with their commit version: ``(version, op, path,
    size, num_records, min_key, max_key)``.  Validates the version
    sequence is gap-free from 0."""
    log = os.path.join(table_dir, _LOG_DIR)
    files = sorted(
        f for f in os.listdir(log) if f.endswith(".json")
    ) if os.path.isdir(log) else []
    if not files:
        raise ValueError(f"{table_dir}: no {_LOG_DIR}/ commits")
    versions = [int(f.split(".")[0]) for f in files]
    if versions != list(range(len(versions))):
        raise ValueError(
            f"{table_dir}: commit sequence has gaps ({versions}) — "
            "refusing to fold an incomplete log"
        )
    raw = spark.read.text(
        [os.path.join(log, f) for f in files]
    ).withColumn(
        "version",
        F.regexp_extract(
            F.input_file_name(), r"(\d{10})\.json", 1
        ).cast("bigint"),
    )
    parsed = raw.select(
        "version",
        F.from_json(
            "value",
            "add struct<path:string, size:bigint, numRecords:bigint, "
            "minKey:bigint, maxKey:bigint>, "
            "remove struct<path:string>",
        ).alias("a"),
    )
    # Malformed-line detection rides the consumer's own scan as an
    # in-row assertion instead of a dedicated probe job per read_log
    # call (round 13: snapshot accounting reads the log ~6x per query,
    # and the probe job was most of each read's cost).  Still loud —
    # EVERY projected column carries the assertion (round 14: a
    # size-only or stats-only consumer must raise too, not silently
    # skip validation because it never evaluated op/path), so any
    # action over any subset of read_log's columns raises with the same
    # message, covering every row read rather than stopping at the
    # first bad line.  (`version` alone is un-guarded by construction:
    # it comes from the file name, not the action line, so a
    # version-only projection carries no per-row claim to validate.)
    valid = F.col("a").isNotNull() & (
        F.col("a.add").isNotNull() | F.col("a.remove").isNotNull()
    )
    chk = F.assert_true(
        valid, F.lit(f"{table_dir}: malformed action line in the log")
    )

    def _guard(col):
        return F.when(chk.isNull(), col)

    return parsed.select(
        "version",
        _guard(
            F.when(F.col("a.add").isNotNull(), F.lit("add")).otherwise(
                F.lit("remove")
            )
        ).alias("op"),
        _guard(F.coalesce("a.add.path", "a.remove.path")).alias("path"),
        _guard(F.col("a.add.size")).alias("size"),
        _guard(F.col("a.add.numRecords")).alias("num_records"),
        _guard(F.col("a.add.minKey")).alias("min_key"),
        _guard(F.col("a.add.maxKey")).alias("max_key"),
    )


def snapshot_files(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
) -> DataFrame:
    """The LIVE file set at ``version`` (default: latest): one row per
    live file with its add-action stats.  Last action per path wins —
    one window over the action rows."""
    from pyspark.sql.window import Window

    actions = read_log(spark, table_dir)
    if version is not None:
        actions = actions.filter(F.col("version") <= version)
    w = Window.partitionBy("path").orderBy(F.col("version").desc())
    latest = actions.withColumn(
        "rn", F.row_number().over(w)
    ).filter(F.col("rn") == 1)
    return latest.filter(F.col("op") == "add").select(
        "path", "size", "num_records", "min_key", "max_key",
        F.col("version").alias("added_in"),
    )


def snapshot_scan(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    key_between: tuple | None = None,
) -> DataFrame:
    """Read the live parquet files of a snapshot, optionally pruning by
    the add-action zone maps first (``key_between=(lo, hi)`` keeps only
    files whose [min_key, max_key] intersects).  The pruned file LIST
    is what reaches the reader — dead files cost zero scan tasks."""
    files = snapshot_files(spark, table_dir, version)
    if key_between is not None:
        lo, hi = key_between
        if files.filter(F.col("min_key").isNull()).limit(1).count():
            raise ValueError(
                f"{table_dir}: add actions lack minKey/maxKey stats — "
                "cannot zone-prune; rewrite the log with stats"
            )
        files = files.filter(
            (F.col("max_key") >= lo) & (F.col("min_key") <= hi)
        )
    paths = [
        os.path.join(table_dir, r.path) for r in files.collect()
    ]
    if not paths:
        raise ValueError(
            f"{table_dir}: snapshot has no live files matching the "
            "predicate (schema would be unknowable for an empty scan)"
        )
    return spark.read.parquet(*paths)
