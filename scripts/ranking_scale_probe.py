"""Scale probe for the round-4 retrieval/curation operators:

1. BM25 — corpus grows 4×; per-doc cost must stay ~flat (the postings
   shuffle carries only query-term postings, never the vocabulary).
2. semantic_dedup — same corpus, n_clusters 4 vs 16: pair work is
   Σ cluster_size², so 4× more clusters must cut the verify-stage pair
   count ~4× (timings move less — fixed per-stage overhead dominates at
   probe scale; the pair count is the scale-law evidence).

Results recorded in SCALE.md.

Usage: python scripts/ranking_scale_probe.py [n_docs] [n_vecs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from h2h_spark import get_spark
from h2h_spark.operators.ranking import bm25_topk
from h2h_spark.operators.simsearch import semantic_dedup

DOCS = "/tmp/h2h_tp/rank_docs_{n}.parquet"
VECS = "/tmp/h2h_tp/rank_vecs_{n}.parquet"
_WORDS = [f"w{i:04d}" for i in range(5000)]


def gen_docs(spark, n: int) -> str:
    path = DOCS.format(n=n)
    if not os.path.isdir(path):
        import pandas as pd

        rng = np.random.default_rng(7)
        rows = [(i, " ".join(rng.choice(_WORDS, size=180))) for i in range(n)]
        pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
        spark.createDataFrame(pdf).repartition(32).write.parquet(path)
    return path


def gen_vecs(spark, n: int, dim: int = 64) -> str:
    path = VECS.format(n=n)
    if not os.path.isdir(path):
        import pandas as pd

        rng = np.random.default_rng(11)
        pdf = pd.DataFrame(
            {"vec_id": range(n),
             "embedding": [rng.standard_normal(dim).astype("float32") for _ in range(n)]}
        )
        spark.createDataFrame(pdf).repartition(32).write.parquet(path)
    return path


def timed(label: str, fn) -> None:
    t0 = time.time()
    out = fn()
    print(f"{label}: {out} in {time.time() - t0:.2f}s")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark("ranking_probe")
    spark.range(10).selectExpr("sum(id)").collect()

    q = ["w0001", "w0002", "w0003"]
    for n in (n_docs // 4, n_docs):
        docs = spark.read.parquet(gen_docs(spark, n))
        timed(f"bm25 n={n}",
              lambda: bm25_topk(docs, "doc_id", "text", q, k=10).count())

    for k in (4, 16):
        vecs = spark.read.parquet(gen_vecs(spark, n_vecs))
        out = semantic_dedup(vecs, "vec_id", "embedding",
                             n_clusters=k, threshold=0.35)
        t0 = time.time()
        dropped = out.filter(~out.keep).count()
        secs = time.time() - t0
        # pair count implied by cluster sizes (the Σ size² scale law)
        sizes = [r.n for r in out.groupBy("cluster").count()
                 .withColumnRenamed("count", "n").collect()]
        pairs = sum(s * (s - 1) // 2 for s in sizes)
        print(f"semdedup k={k}: dropped={dropped} intra-pairs={pairs} "
              f"in {secs:.2f}s")


if __name__ == "__main__":
    main()
