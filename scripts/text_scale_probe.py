"""Text-pipeline throughput probe — reuses the dedup probe's ~100 MB
synthetic corpus (110k docs x 180 tokens) and measures the round-3
text operators end to end: bigram-LM perplexity, Gopher rules, TF-IDF
keywords, span-duplication, chunking, vocabulary coverage.
Results recorded in SCALE.md.

Usage: python scripts/text_scale_probe.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from h2h_spark import get_spark
from h2h_spark.operators import lm as LM
from h2h_spark.operators import text as TX
from scripts.dedup_scale_probe import PATH, generate


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("text_probe")
    spark.range(10).mapInArrow(lambda it: it, "id long").collect()
    generate(spark, n)
    docs = spark.read.parquet(PATH)
    n_docs = docs.count()

    probes = [
        ("gopher_rules", lambda: TX.gopher_rules(docs, "doc_id", "text")),
        ("chunk_documents", lambda: TX.chunk_documents(docs, "doc_id", "text")),
        ("vocab_coverage", lambda: TX.vocab_coverage(docs, "doc_id", "text")),
        ("tfidf_keywords", lambda: TX.tfidf_keywords(docs, "doc_id", "text")),
        ("span_duplication", lambda: TX.span_duplication(docs, "doc_id", "text")),
        ("lm_perplexity", lambda: LM.perplexity(docs, "doc_id", "text")),
    ]
    for label, fn in probes:
        spark.catalog.clearCache()
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        print(f"{label:18s} {dt:6.2f} s  {n_docs / dt:9.0f} docs/s")


if __name__ == "__main__":
    main()
