"""Block-split vs single-stream throughput probe for the round-12
codec tiers (xz blocks, splittable bzip2) — the wall-clock evidence
that the split paths buy real parallelism, recorded in SCALE.md.

Builds one ~N MB .jsonl corpus, writes it (a) as a multi-block xz
shard (1 MiB blocks, the `xz -T` layout), (b) as a single-block xz
stream, (c) as a multi-block bzip2 stream (level 1 -> 100 kB blocks),
then times the same count+sum aggregation through the jsonl source in
split mode vs forced layout="stream" (one task per file).

Usage: python scripts/codec_split_probe.py [mb]
"""

from __future__ import annotations

import bz2
import lzma
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from h2h_spark import get_spark
from h2h_spark.sources.jsonl import read_jsonl_gz
from h2h_spark.sources.xzblocks import write_xz_blocks

ROOT = "/tmp/h2h_codec_probe"


def build(mb: int) -> tuple[bytes, int]:
    import json

    lines = []
    i = 0
    total = 0
    target = mb << 20
    while total < target:
        ln = json.dumps({"i": i, "v": i % 97, "pad": "x" * (i % 61)})
        lines.append(ln)
        total += len(ln) + 1
        i += 1
    return ("\n".join(lines) + "\n").encode(), i


def main() -> None:
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    os.makedirs(f"{ROOT}/xz_blocks", exist_ok=True)
    os.makedirs(f"{ROOT}/xz_stream", exist_ok=True)
    os.makedirs(f"{ROOT}/bz2_blocks", exist_ok=True)
    payload, n_rows = build(mb)
    print(f"corpus: {len(payload) >> 20} MiB, {n_rows} lines")

    p_xzb = f"{ROOT}/xz_blocks/c.jsonl.xz"
    if not os.path.exists(p_xzb):
        step = 1 << 20
        write_xz_blocks(
            p_xzb,
            [payload[i:i + step] for i in range(0, len(payload), step)],
            preset=1,
        )
    p_xzs = f"{ROOT}/xz_stream/c.jsonl.xz"
    if not os.path.exists(p_xzs):
        open(p_xzs, "wb").write(lzma.compress(payload, preset=1))
    p_bz2 = f"{ROOT}/bz2_blocks/c.jsonl.bz2"
    if not os.path.exists(p_bz2):
        open(p_bz2, "wb").write(bz2.compress(payload, 1))

    spark = get_spark("codec_probe")
    spark.range(10).mapInArrow(lambda it: it, "id long").collect()

    def run(path_dir: str, codec: str, layout: str) -> tuple[float, int]:
        t0 = time.time()
        df = read_jsonl_gz(
            spark, path_dir, max_partition_bytes=1 << 20,
            codec=codec, layout=layout,
        )
        j = df.select(F.from_json("line", "i bigint, v bigint").alias("j"))
        row = j.agg(F.count(F.lit(1)).alias("n"),
                    F.sum("j.v").alias("s")).head()
        assert row.n == n_rows, (row.n, n_rows)
        return time.time() - t0, df.rdd.getNumPartitions()

    for label, d, codec, layout in (
        ("xz multi-block SPLIT", f"{ROOT}/xz_blocks", "xz", "auto"),
        ("xz multi-block STREAM-forced", f"{ROOT}/xz_blocks", "xz", "stream"),
        ("xz single-block (1-task cliff)", f"{ROOT}/xz_stream", "xz", "auto"),
        ("bz2 SPLIT", f"{ROOT}/bz2_blocks", "bz2", "auto"),
        ("bz2 STREAM-forced", f"{ROOT}/bz2_blocks", "bz2", "stream"),
    ):
        # twice: first run includes planning/scan warmup; report both
        t1, parts = run(d, codec, layout)
        t2, _ = run(d, codec, layout)
        print(f"{label:34s} {parts:4d} tasks  {t1:6.1f}s / {t2:6.1f}s")


if __name__ == "__main__":
    main()
