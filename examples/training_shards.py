"""Executable CORPUS→TRAINING-SHARDS pipeline on the engine — the
export-side companion to ``crawl_to_corpus.py``:

  documents → quality gate (Gopher rules) → exact + substring dedup
  (duplicate-span excise accounting) → token counting → length-bucketed
  packing → tf.Example TFRecord shard EXPORT → splittable read-back
  verification (record counts + feature totals).

Every stage is a graded operator (q_gopher_rules / q_dedup_exact /
q_dup_excise / q_token_count / q_length_batching / q_tfrecord /
q_tf_example); this file shows them composed end to end.

    python examples/training_shards.py [sf_dir]

Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from h2h_spark import get_spark


def log(stage: str, **kw) -> None:
    print(json.dumps({"stage": stage, **kw}))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training_shards", cpus=8)
    work = "/tmp/training_shards"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    log("load", n_docs=docs.count())

    # --- 1. quality gate -------------------------------------------------
    from h2h_spark.operators.text import gopher_rules

    verdict = gopher_rules(docs, "doc_id", "text").select("doc_id", "keep")
    gated = docs.join(verdict, "doc_id").filter("keep").select(
        "doc_id", "text"
    )
    n_gated = gated.count()
    log("quality_gate", n_kept=n_gated)

    # --- 2. exact dedup (min-id winner per distinct text) -----------------
    from h2h_spark.operators.dedup import exact_dedup

    kept = exact_dedup(gated, ["text"], "doc_id").select("doc_id", "text")
    n_kept = kept.count()
    log("exact_dedup", n_kept=n_kept)

    # --- 3. substring-dup excise budget ----------------------------------
    from h2h_spark.operators.text import excise_duplicate_spans

    budget = excise_duplicate_spans(kept, "doc_id", "text",
                                    window=8, min_docs=2)
    tot = budget.agg(
        F.sum("n_tokens").alias("tok"),
        F.sum("n_excised").alias("cut"),
        F.sum("n_retained").alias("ret"),
    ).collect()[0]
    log("substring_excise", total_tokens=int(tot["tok"]),
        excised_tokens=int(tot["cut"]), retained_tokens=int(tot["ret"]))

    # --- 4. token counts + length-bucketed packing order ------------------
    from h2h_spark.operators.text import token_stats

    stats = token_stats(kept, "doc_id", "text").select("doc_id", "n_tokens")
    packed = (
        kept.join(stats, "doc_id")
        .withColumn("bucket", (F.col("n_tokens") / 64).cast("int"))
    )
    log("length_buckets",
        n_buckets=packed.select("bucket").distinct().count())

    # --- 5. tf.Example TFRecord shard export ------------------------------
    from h2h_spark.sources.tfrecord import read_tfrecord, write_tf_examples

    shards = f"{work}/shards"
    feats = packed.select(
        F.col("doc_id").alias("id"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("text"),
    ).repartition(4, "bucket")
    write_tf_examples(feats, shards)
    n_files = len([f for f in os.listdir(shards) if f.endswith(".tfrecord")])
    log("shard_export", n_shards=n_files)

    # --- 6. splittable read-back verification -----------------------------
    from h2h_spark.operators.tfexample import parse_tf_examples

    back = parse_tf_examples(
        read_tfrecord(spark, shards, max_partition_bytes=1 << 16,
                      include_data=True).select("data"),
        "data",
        {"id": "int64", "n_tokens": "int64"},
    ).select(
        F.element_at("id", 1).alias("id"),
        F.element_at("n_tokens", 1).alias("n_tokens"),
    )
    n_back = back.count()
    tok_back = back.agg(F.sum("n_tokens")).collect()[0][0]
    tok_src = feats.agg(F.sum("n_tokens")).collect()[0][0]
    log("readback_verify", n_records=n_back,
        tokens_match=bool(tok_back == tok_src))
    assert n_back == n_kept and tok_back == tok_src

    # --- 7. .jsonl.zst corpus publication (Dolma/RedPajama shape) ---------
    from h2h_spark.sources.jsonl import read_jsonl_gz, write_jsonl_shards

    corpus_dir = f"{work}/corpus_jsonl_zst"
    write_jsonl_shards(
        feats.select("id", "n_tokens", "bucket"), corpus_dir,
        codec="zst", lines_per_member=256,
    )
    n_pub = read_jsonl_gz(spark, corpus_dir, codec="zst").count()
    log("jsonl_zst_publish", n_lines=n_pub,
        splittable=True, match=bool(n_pub == n_kept))
    assert n_pub == n_kept
    log("done", ok=True)


if __name__ == "__main__":
    main()
