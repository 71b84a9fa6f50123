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


def fuzzy_skew_probe(spark, n: int = 60_000, hot_frac: float = 0.5) -> None:
    """fuzzy_join under a HOT blocking key (round 12): ``hot_frac`` of
    all names share the last token ``inc`` — without the ``max_block``
    guard that one block alone is (n*hot_frac)² candidate pairs and the
    probe never finishes at scale; with it the hot key is excluded and
    wall time tracks the well-blocked remainder."""
    import pandas as pd

    from h2h_spark.operators.text import fuzzy_join

    rng = np.random.default_rng(7)
    n_hot = int(n * hot_frac)
    last = np.where(
        np.arange(n) < n_hot,
        "inc",
        rng.choice(_WORDS, size=n),
    )
    first = rng.choice(_WORDS, size=n)
    names = pd.DataFrame({
        "id": np.arange(n),
        "name": [f"{a} {b}" for a, b in zip(first, last)],
    })
    left = spark.createDataFrame(names).repartition(32)
    right = spark.createDataFrame(
        names.assign(id=names["id"] + n)
    ).repartition(32)
    t0 = time.time()
    matched = fuzzy_join(
        left, right, "name", "name", max_edit=1, max_block=5_000
    ).count()
    dt = time.time() - t0
    print(
        f"fuzzy_join skew probe: {n} x {n} names, {n_hot} sharing one "
        f"blocking key, max_block=5000: {matched} matches in {dt:.1f}s "
        f"(hot block excluded; uncapped would verify "
        f"{n_hot * n_hot / 1e9:.1f}B candidate pairs)"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("dedup_probe")
    spark.range(10).mapInArrow(lambda it: it, "id long").collect()
    if len(sys.argv) > 2 and sys.argv[2] == "fuzzy":
        fuzzy_skew_probe(spark, n)
        return
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
