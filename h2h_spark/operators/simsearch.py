"""Similarity search over embedding columns (engine extension, SURVEY.md
§2.3 E2).

Embeddings are ``array<float>`` columns.  Two paths:

- :func:`cosine_topk` — exact brute force: per-row dot product via
  ``zip_with`` + ``aggregate`` (JVM-side, no UDF), then a global top-k.
  The right baseline at any scale where a full scan is acceptable (top-k
  is a TakeOrdered, not a full sort).
- :func:`ann_topk` — random-hyperplane LSH: deterministic hyperplanes
  (seeded), documents bucketed by sign-bit signature; a query probes its
  own bucket plus all 1-bit-flip neighbors.  At 100 TB the bucket column
  becomes the partition/bucketing key so a probe touches a handful of
  partitions instead of the fleet.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot_with_literal(vec_col: Column, q: Sequence[float]) -> Column:
    lit = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec_col: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_scores(
    df: DataFrame, id_col: str, vec_col: str, query: Sequence[float]
) -> DataFrame:
    """``(id, score)`` — exact cosine similarity to ``query``."""
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query))
    score = _dot_with_literal(F.col(vec_col), query) / (_norm(F.col(vec_col)) * F.lit(qnorm))
    return df.select(F.col(id_col), score.alias("score"))


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    round_digits: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine similarity (ties broken by id — deterministic)."""
    scores = cosine_scores(df, id_col, vec_col, query)
    if round_digits is not None:
        scores = scores.withColumn("score", F.round("score", round_digits))
    return scores.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def knn_join(
    probes: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    round_digits: int = 3,
) -> DataFrame:
    """Exact k-nearest-neighbors of every probe row against the corpus:
    ``(probe_id, neighbor_id, score, rank)``.

    Brute force: probes × corpus cosine via ``zip_with``/``aggregate``
    (JVM), then a per-probe window top-k.  Deterministic: scores rounded
    before ranking, ties broken by neighbor id.  At 100 TB the corpus side
    is LSH-bucketed first (see :func:`ann_topk`) — this is the exact
    baseline and the small-probe-set path (broadcast the probes).
    """
    from pyspark.sql.window import Window

    # Per-row norms below the join (inlining barrier) — see cosine_near_pairs.
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("__pv"),
        _norm(F.col(vec_col)).alias("__pn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _norm(F.col(vec_col)).alias("__cn"),
    )
    dot = F.aggregate(
        F.zip_with("__pv", "__cv", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    joined = F.broadcast(p).crossJoin(c).filter(
        F.col("probe_id") != F.col("neighbor_id")
    )
    score = F.round(dot / (F.col("__pn") * F.col("__cn")), round_digits)
    scored = joined.select("probe_id", "neighbor_id", score.alias("score"))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def cosine_near_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    probe_max_id: int | None = None,
    round_digits: int = 3,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: ``(id_a, id_b, score)`` with
    ``id_a < id_b`` and rounded cosine >= threshold.

    Exact.  With ``probe_max_id`` set, the bounded probe block is broadcast
    and scored against the streamed corpus with one Arrow-batched numpy
    matmul per partition (BLAS, no per-pair expression work) — the shape
    that scales: probe blocks iterate, the corpus is read once per block.
    Without a bound, falls back to the JVM cross-join expression.  For
    all-pairs at 100 TB, block both sides or LSH-bucket first
    (:func:`signature_col`).
    """
    if probe_max_id is not None:
        return _near_pairs_blocked(
            df, id_col, vec_col, threshold, probe_max_id, round_digits
        )
    # Norms are per-ROW work: compute them as projected columns below the
    # join (the join is an inlining barrier), so the per-pair expression is
    # just dot/(na*nb) — not a per-pair norm recomputation.
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        _norm(F.col(vec_col)).alias("__na"),
    )
    if probe_max_id is not None:
        a = a.filter(F.col("id_a") < probe_max_id)
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        _norm(F.col(vec_col)).alias("__nb"),
    )
    dot = F.aggregate(
        F.zip_with("__va", "__vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    score = F.round(dot / (F.col("__na") * F.col("__nb")), round_digits)
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", score.alias("score"))
        .filter(F.col("score") >= threshold)
    )


def _near_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    probe_max_id: int,
    round_digits: int,
) -> DataFrame:
    import pandas as pd

    spark = df.sparkSession
    probe_rows = (
        df.filter(F.col(id_col) < probe_max_id).select(id_col, vec_col).collect()
    )
    pids = np.array([r[0] for r in probe_rows], dtype=np.int64)
    pmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in probe_rows])
    pmat = pmat / np.linalg.norm(pmat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((pids, pmat))

    def score(batches):
        b_pids, b_pmat = bc.value
        for pdf in batches:
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            cmat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
            scores = np.round(cmat @ b_pmat.T, round_digits)  # corpus × probes
            ci, pi = np.nonzero(scores >= threshold)
            if len(ci) == 0:
                continue
            id_a = np.minimum(b_pids[pi], cids[ci])
            id_b = np.maximum(b_pids[pi], cids[ci])
            keep = id_a < id_b  # drop self-pairs
            yield pd.DataFrame(
                {
                    "id_a": id_a[keep],
                    "id_b": id_b[keep],
                    "score": scores[ci, pi][keep],
                }
            )

    pairs = df.select(id_col, vec_col).mapInPandas(
        score, "id_a long, id_b long, score double"
    )
    # A pair of two probe ids is produced twice (once per side) — dedup.
    return pairs.distinct()


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 3,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means partitions the corpus
    into centroid cells; a query scans only the ``n_probe`` nearest cells.

    Scale path: fit centroids on a sample, persist the corpus partitioned
    by cell id — each probe then touches n_probe/n_centroids of the data at
    the source.  Locally the cells are a filter over the assigned corpus.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("__features"),
    )
    model = KMeans(
        k=n_centroids, seed=seed, featuresCol="__features", predictionCol="__cell"
    ).fit(feat)
    assigned = model.transform(feat)
    centers = model.clusterCenters()
    qv = np.asarray(list(map(float, query)))
    order = sorted(
        range(len(centers)), key=lambda i: float(np.linalg.norm(centers[i] - qv))
    )
    probes = order[:n_probe]
    cands = assigned.filter(F.col("__cell").isin(probes)).drop(
        "__features", "__cell"
    )
    return cosine_topk(cands, id_col, vec_col, query, k)


def hyperplanes(dim: int, nbits: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim))


def signature_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Integer LSH signature: bit j = sign(dot(vec, plane_j)) — built from
    per-plane ``aggregate`` expressions, all JVM-side."""
    sig = F.lit(0).cast("long")
    for j in range(planes.shape[0]):
        d = _dot_with_literal(vec_col, planes[j].tolist())
        sig = sig + F.shiftleft(F.when(d >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), j)
    return sig


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    nbits: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH blocking — the scale path.

    Sign-LSH buckets the corpus (one projection, no shuffle until the
    grouping); candidate pairs come from shared buckets in the query bucket
    plus 1-bit neighbors implicitly via multiband (here: exact-bucket
    blocking, recall governed by nbits vs threshold — high thresholds need
    few bits); exact cosine verifies.  Compare :func:`cosine_near_pairs`
    (exact, quadratic) — this trades recall for a linear candidate count.
    """
    dim = len(df.select(vec_col).head()[0])
    planes = hyperplanes(dim, nbits, seed)
    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("__v"),
        _norm(F.col(vec_col)).alias("__n"),
        signature_col(F.col(vec_col), planes).alias("bucket"),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    dot = F.aggregate(
        F.zip_with("a.__v", "b.__v", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    score = F.round(dot / (F.col("a.__n") * F.col("b.__n")), 4)
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            score.alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def ann_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    nbits: int = 12,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: LSH bucket probe (query bucket + 1-bit flips),
    exact cosine within candidates.

    With nbits=12 a uniform corpus splits into ~4096 buckets; multiprobe
    widens recall to the 13 nearest buckets.  Scale path: persist
    ``df.withColumn("bucket", signature_col(...))`` partitioned by bucket
    and this probe prunes partitions at the source.
    """
    dim = len(query)
    planes = hyperplanes(dim, nbits, seed)
    qv = np.asarray(list(map(float, query)))
    qsig = 0
    for j in range(nbits):
        if float(planes[j] @ qv) >= 0:
            qsig |= 1 << j
    probes = [qsig] + ([qsig ^ (1 << j) for j in range(nbits)] if multiprobe else [])
    bucketed = df.withColumn("bucket", signature_col(F.col(vec_col), planes))
    cands = bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(cands, id_col, vec_col, query, k)
