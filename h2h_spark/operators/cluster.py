"""Centroid clustering primitives over embedding columns (engine
extension, SURVEY.md §2.3 E2 — corpus-curation clustering).

Training-data pipelines cluster document embeddings to balance topic
mixes, detect mode collapse, and drive cluster-based sampling (the
SemDeDup / cluster-filter family).  The two primitives here are the two
halves of a Lloyd iteration, each expressed as plain DataFrame ops so
Catalyst plans them (broadcast join + partial aggregation), which makes
a full distributed k-means a short driver loop:

- :func:`centroid_assign` — the E-step: assign every vector to its
  nearest centroid.  Centroids are k rows (k ≪ corpus) so the join is a
  broadcast; the L2 distance is a JVM expression (``zip_with`` +
  ``aggregate``, no Python); the argmin is ``min(struct(dist, label))``
  — one partial-aggregated shuffle keyed by vector id, deterministic
  under ties (lowest label wins).
- :func:`centroid_update` — the M-step: recompute centroids as the
  per-assignment mean, via ``posexplode`` → per-(label, dim) avg →
  ``array_agg`` ordered by dim.  Two shuffles keyed by (label, dim) and
  label; dimension count is a literal so rows stay narrow.

At 100 TB: the corpus never re-partitions across iterations (the E-step
shuffle is by vector id only for the argmin, and AQE coalesces it); the
M-step aggregates k×dim rows — trivially small.  Iterations stream over
the cached/persisted vector table; nothing driver-side ever holds more
than k×dim floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _l2_sq(a, b):
    """Squared L2 distance between two float-array columns, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def centroid_assign(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    label_col: str,
    cvec_col: str,
) -> DataFrame:
    """E-step: nearest-centroid assignment (squared L2, broadcast join).

    Returns ``(id_col, assigned, dist_sq)`` — one row per input vector.
    ``centroids`` must be small (k rows); it is broadcast so the scan of
    ``vectors`` is shuffle-free, and the only shuffle is the argmin
    aggregation keyed by ``id_col`` (partial-aggregated map-side).
    Ties on distance resolve to the lowest label — deterministic.
    """
    cents = F.broadcast(
        centroids.select(
            F.col(label_col).alias("__clabel"), F.col(cvec_col).alias("__cvec")
        )
    )
    scored = vectors.select(id_col, vec_col).crossJoin(cents)
    dist = _l2_sq(F.col(vec_col), F.col("__cvec"))
    best = (
        scored.select(id_col, F.struct(dist.alias("d"), F.col("__clabel").alias("l")).alias("__s"))
        .groupBy(id_col)
        .agg(F.min("__s").alias("__best"))
    )
    return best.select(
        id_col,
        F.col("__best.l").alias("assigned"),
        F.col("__best.d").alias("dist_sq"),
    )


def centroid_update(
    vectors: DataFrame,
    vec_col: str,
    assigned: DataFrame,
    id_col: str,
    dim: int,
) -> DataFrame:
    """M-step: per-assignment mean vector.

    Joins the assignment back to the vectors on ``id_col`` (shuffle or
    broadcast depending on sizes — left to AQE), explodes to (label,
    dim, value), averages, and re-assembles ordered arrays.  Output:
    ``(assigned, centroid, n_members)``.
    """
    joined = vectors.join(assigned.select(id_col, "assigned"), id_col)
    per_dim = (
        joined.select("assigned", F.posexplode(vec_col).alias("__i", "__x"))
        .groupBy("assigned", "__i")
        .agg(F.avg(F.col("__x").cast("double")).alias("__m"))
    )
    counts = joined.groupBy("assigned").agg(F.count("*").alias("n_members"))
    cents = (
        per_dim.groupBy("assigned")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__i"), F.col("__m")))
            ).alias("__sm")
        )
        .select(
            "assigned",
            F.transform(F.col("__sm"), lambda s: s.getField("__m")).alias("centroid"),
        )
    )
    return cents.join(counts, "assigned")
