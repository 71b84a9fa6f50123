"""Clustering throughput probe: one full k-means iteration (E-step
assignment + M-step centroid recompute) over a synthetic 200k x 64
embedding corpus at k=100, plus a full kmeans_fit run to convergence.
Numbers recorded in SCALE.md.

Usage: python scripts/cluster_scale_probe.py [n_vecs] [k]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from h2h_spark import get_spark
from h2h_spark.operators.cluster import (
    centroid_assign,
    centroid_assign_blas,
    centroid_update,
    kmeans_fit,
)

PATH = "/tmp/h2h_spark_work/cluster_probe_vectors"


def generate(spark, n: int, dim: int = 64) -> None:
    if os.path.exists(os.path.join(PATH, "_SUCCESS")):
        return
    # Deterministic pseudo-random vectors, JVM-side (no RNG, no Python):
    # hash-derived values in [-1, 1) per (id, dim).
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(20001)) - 10000)
            / 10000.0,
        ).cast("array<float>").alias("embedding"),
    )
    vecs.repartition(32).write.mode("overwrite").parquet(PATH)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark("cluster_probe")
    generate(spark, n)
    vecs = spark.read.parquet(PATH).persist()
    n_vecs = vecs.count()

    cents = vecs.orderBy("vec_id").limit(k).select(
        F.col("vec_id").cast("int").alias("label"),
        F.col("embedding").cast("array<double>").alias("cvec"),
    )

    t0 = time.time()
    assigned = centroid_assign(vecs, "vec_id", "embedding", cents, "label", "cvec")
    assigned.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"E-step (k={k})      {dt:6.2f} s  {n_vecs / dt:9.0f} vec/s")

    cmat = [
        [float(x) for x in r["cvec"]] for r in cents.orderBy("label").collect()
    ]
    t0 = time.time()
    centroid_assign_blas(vecs, "vec_id", "embedding", cmat).write.format(
        "noop"
    ).mode("overwrite").save()
    dt = time.time() - t0
    print(f"E-step BLAS (k={k}) {dt:6.2f} s  {n_vecs / dt:9.0f} vec/s")

    assigned = assigned.persist()
    assigned.count()
    t0 = time.time()
    centroid_update(vecs, "embedding", assigned, "vec_id", dim=64).write.format(
        "noop"
    ).mode("overwrite").save()
    dt = time.time() - t0
    print(f"M-step (k={k})      {dt:6.2f} s  {n_vecs / dt:9.0f} vec/s")
    assigned.unpersist()

    t0 = time.time()
    final, _, n_it = kmeans_fit(
        vecs, "vec_id", "embedding", k=k, max_iter=5, tol=1e-4
    )
    final.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(
        f"kmeans_fit ({n_it} it)  {dt:6.2f} s  {n_vecs * n_it / dt:9.0f} vec-iters/s"
    )


if __name__ == "__main__":
    main()
