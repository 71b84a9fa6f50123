"""Block/member-split vs single-stream throughput probe for EVERY
splittable jsonl codec tier (VERDICT r12 item 5 — round 12 probed
only xz/bz2 and caught two shipped-looking super-linear defects;
this sweep keeps that guard on all of gz/zst/lz4/bz2/xz).

For each codec it builds the splittable layout at TWO sizes and runs
the same count+sum aggregation through the jsonl source:

- split mode at both sizes -> per-byte cost must be near-LINEAR
  (full/half wall ratio <= LINEARITY_CAP x the size ratio; a
  quadratic per-line or per-byte loop shows up as a ratio far above
  the size ratio, which is how the r12 xz/bz2 line-emit bug and the
  per-byte-Python CRC64 were caught);
- forced layout="stream" (one task per file) at the large size ->
  the split path should not be slower than the stream cliff it
  replaces (xz/bz2/gz/zst/lz4 all carry member/block parallelism).

Writes a JSON artifact (default PROBE_codec_split_r13.json at the
repo root) with every figure; exits non-zero on a linearity breach
so the sweep can gate evidence runs.

Usage: python scripts/codec_split_probe.py [mb] [out.json]
"""

from __future__ import annotations

import bz2
import json
import lzma
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from h2h_spark import get_spark
from h2h_spark.sources.jsonl import (
    read_jsonl_gz,
    write_jsonl_gz_members,
    write_jsonl_lz4_members,
    write_jsonl_zst_members,
)
from h2h_spark.sources.xzblocks import write_xz_blocks

ROOT = "/tmp/h2h_codec_probe"
LINEARITY_CAP = 1.6  # full/half wall ratio may exceed the 2x size
#                      ratio by at most this factor (scheduling noise)


def build(mb: int) -> tuple[list[str], bytes]:
    lines = []
    total = 0
    target = mb << 20
    i = 0
    while total < target:
        ln = json.dumps({"i": i, "v": i % 97, "pad": "x" * (i % 61)})
        lines.append(ln)
        total += len(ln) + 1
        i += 1
    return lines, ("\n".join(lines) + "\n").encode()


def write_fixture(codec: str, d: str, lines: list[str],
                  payload: bytes) -> str:
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, f"c.jsonl.{codec}")
    if os.path.exists(p):
        return p
    lpm = 1024  # ~64 KiB plaintext members (the Dolma shard shape)
    if codec == "gz":
        write_jsonl_gz_members(p, lines, lines_per_member=lpm)
    elif codec == "zst":
        write_jsonl_zst_members(p, lines, lines_per_member=lpm)
    elif codec == "lz4":
        write_jsonl_lz4_members(p, lines, lines_per_member=lpm)
    elif codec == "xz":
        step = 1 << 20
        write_xz_blocks(
            p, [payload[i:i + step] for i in range(0, len(payload), step)],
            preset=1,
        )
    elif codec == "bz2":
        open(p, "wb").write(bz2.compress(payload, 1))
    return p


def main() -> None:
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PROBE_codec_split_r13.json",
    )
    sizes = {"half": mb // 2, "full": mb}
    corpora = {}
    for tag, m in sizes.items():
        lines, payload = build(m)
        corpora[tag] = (lines, payload, len(lines))
        print(f"{tag} corpus: {len(payload) >> 20} MiB, {len(lines)} lines")

    spark = get_spark("codec_probe")
    spark.range(10).mapInArrow(lambda it: it, "id long").collect()

    def run(path_dir: str, codec: str, layout: str,
            n_rows: int) -> tuple[float, int]:
        t0 = time.time()
        df = read_jsonl_gz(
            spark, path_dir, max_partition_bytes=1 << 20,
            codec=codec, layout=layout,
        )
        j = df.select(F.from_json("line", "i bigint, v bigint").alias("j"))
        row = j.agg(F.count(F.lit(1)).alias("n"),
                    F.sum("j.v").alias("s")).head()
        assert row.n == n_rows, (codec, layout, row.n, n_rows)
        return time.time() - t0, df.rdd.getNumPartitions()

    results: dict = {"mb": mb, "linearity_cap": LINEARITY_CAP,
                     "codecs": {}}
    breaches = []
    for codec in ("gz", "zst", "lz4", "bz2", "xz"):
        rec: dict = {}
        for tag in ("half", "full"):
            lines, payload, n = corpora[tag]
            d = f"{ROOT}/{codec}_{tag}"
            write_fixture(codec, d, lines, payload)
            # warm once, measure second (planning/scan caches)
            run(d, codec, "auto", n)
            wall, parts = run(d, codec, "auto", n)
            rec[tag] = {"wall_s": round(wall, 2), "tasks": parts}
            print(f"{codec:4s} {tag:4s} SPLIT  {parts:4d} tasks "
                  f"{wall:6.2f}s")
        _, _, n_full = corpora["full"]
        run(f"{ROOT}/{codec}_full", codec, "stream", n_full)
        wall_s, _ = run(f"{ROOT}/{codec}_full", codec, "stream", n_full)
        rec["full_stream_s"] = round(wall_s, 2)
        rec["split_speedup"] = round(wall_s / rec["full"]["wall_s"], 2)
        size_ratio = sizes["full"] / sizes["half"]
        rec["wall_ratio"] = round(
            rec["full"]["wall_s"] / rec["half"]["wall_s"], 2
        )
        rec["linear_ok"] = rec["wall_ratio"] <= LINEARITY_CAP * size_ratio
        if not rec["linear_ok"]:
            breaches.append(codec)
        print(f"{codec:4s} full STREAM-forced   {wall_s:6.2f}s  "
              f"split speedup {rec['split_speedup']}x  "
              f"half->full wall ratio {rec['wall_ratio']} "
              f"({'OK' if rec['linear_ok'] else 'SUPER-LINEAR'})")
        results["codecs"][codec] = rec

    with open(out_json, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {out_json}")
    if breaches:
        print(f"LINEARITY BREACH: {breaches}")
        sys.exit(1)


if __name__ == "__main__":
    main()
