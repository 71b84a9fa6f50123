"""MinHash-LSH dedup throughput probe — synthesizes a ~100 MB text corpus
(with planted near-duplicates) and measures the full near-dup pipeline
(shingle → 64 minhashes → 16-band LSH → exact Jaccard verify) end to end.
Results recorded in SCALE.md.

Usage: python scripts/dedup_scale_probe.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from h2h_spark import get_spark
from h2h_spark.operators.dedup import minhash_near_duplicates

PATH = "/tmp/h2h_tp/docs_big.parquet"
_WORDS = [f"w{i:04d}" for i in range(5000)]


def generate(spark, n: int) -> None:
    if os.path.isdir(PATH):
        return
    import pandas as pd

    rng = np.random.default_rng(42)
    rows = []
    for i in range(n):
        toks = rng.choice(_WORDS, size=180)
        rows.append((i, " ".join(toks)))
        if i % 10 == 0 and i + 1 < n:  # plant a near-dup of every 10th doc
            mutated = toks.copy()
            idx = rng.choice(len(mutated), size=9, replace=False)
            mutated[idx] = rng.choice(_WORDS, size=9)
            rows.append((n + i, " ".join(mutated)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).repartition(32).write.parquet(PATH)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("dedup_probe")
    spark.range(10).mapInArrow(lambda it: it, "id long").collect()
    generate(spark, n)
    docs = spark.read.parquet(PATH)
    n_docs = docs.count()
    mb = docs.selectExpr("sum(length(text))").head()[0] / 1e6
    t0 = time.time()
    pairs = minhash_near_duplicates(
        docs, "doc_id", "text", num_hashes=64, bands=16, jaccard_threshold=0.5
    ).count()
    dt = time.time() - t0
    print(
        f"minhash near-dup: {n_docs} docs / {mb:.0f} MB in {dt:.1f}s = "
        f"{mb/dt:.0f} MB/s, {n_docs/dt:.0f} docs/s, {pairs} pairs found"
    )


if __name__ == "__main__":
    main()
