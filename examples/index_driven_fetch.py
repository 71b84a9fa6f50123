"""Executable INDEX-DRIVEN crawl-selection pipeline on the engine.

The round-10 crawl-index tier composed the way a web-archive team runs
it — the pruning inversion that makes 100 TB tractable:

  build a WARC shard set (with member extents captured)
    → PRODUCE the sorted CDX index (range-partition on SURT + sort,
      `write_cdx_sharded`) → AUDIT it (`verify_cdx_shards`)
    → filter the INDEX (status / mime / digest dedup — no WARC byte
      read yet)
    → FETCH only the surviving records by (file, offset, length)
      (`fetch_warc_by_location`: one seek + one sized read each)
    → text accounting on exactly the fetched payloads.

Every stage is an operator the graded queries exercise
(q_cdx_build / q_cdx_scan / q_cdx_dedup / q_cdx_locate); this file
shows them composed over a synthesized mini-archive.

    python examples/index_driven_fetch.py [sf_dir]

Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from h2h_spark import get_spark
from h2h_spark.sources.cdx import (
    fetch_warc_by_location,
    read_cdx,
    surt_key,
    verify_cdx_shards,
    write_cdx_sharded,
)
from h2h_spark.sources.warc import write_warc_gz_records


def stage(name: str, **kv) -> None:
    print(json.dumps({"stage": name, **kv}))


def main() -> None:
    spark = get_spark("index_driven_fetch_example")
    with tempfile.TemporaryDirectory() as root:
        warc_dir = os.path.join(root, "warc")
        idx_dir = os.path.join(root, "cdx")
        os.makedirs(warc_dir)

        # -- 1. a mini WARC archive: 400 captures, 2 shards, extents
        #    captured at write time (what a crawler's writer records)
        captures = []
        for shard in range(2):
            recs = []
            for i in range(shard * 200, shard * 200 + 200):
                payload = (b"content %05d|" % (i % 60)) * (i % 3 + 1)
                recs.append((
                    {
                        "WARC-Type": "response",
                        "WARC-Record-ID": f"<urn:{i}>",
                        "WARC-Target-URI": f"https://h{i % 23}.org/p/{i}",
                    },
                    payload,
                ))
            wpath = os.path.join(warc_dir, f"crawl-{shard}.warc.gz")
            extents = write_warc_gz_records(wpath, recs)
            for i, (off, ln) in zip(range(shard * 200, shard * 200 + 200),
                                    extents):
                captures.append((
                    f"https://h{i % 23}.org/p/{i}",
                    f"20240101{i:06d}",
                    wpath, off, ln,
                    200 if i % 5 else 404,
                    f"sha1:{i % 60:05d}",
                ))
        stage("archive", n_captures=len(captures), n_shards=2)

        # -- 2. PRODUCE the sorted index (range shuffle + per-range sort)
        cap_df = spark.createDataFrame(
            captures,
            "url string, ts string, warc_file string, offset long, "
            "length long, status long, digest string",
        ).withColumn("surt", surt_key(F.col("url"))) \
         .withColumn("mime", F.lit("text/html"))
        write_cdx_sharded(cap_df, idx_dir, n_shards=4)
        audit = verify_cdx_shards(spark, idx_dir).collect()
        stage(
            "index_build",
            shards=len(audit),
            rows=sum(r["n_rows"] for r in audit),
            all_sorted=all(r["is_sorted"] for r in audit),
        )

        # -- 3. filter the INDEX: live pages only, digest-deduped to the
        #    earliest capture — no WARC byte has been read yet
        idx = read_cdx(spark, idx_dir)
        live = idx.filter(F.col("status") == 200)
        chosen = live.groupBy("digest").agg(
            F.min_by(
                F.struct("warc_file", "offset", "length", "surt"), "ts"
            ).alias("c")
        ).select("digest", "c.*")
        stage(
            "index_prune",
            total=idx.count(), live=live.count(),
            after_dedup=chosen.count(),
        )

        # -- 4. FETCH only the survivors (one seek + sized read each)
        fetched = fetch_warc_by_location(chosen)
        out = fetched.agg(
            F.count(F.lit(1)).alias("n_fetched"),
            F.sum("payload_len").alias("bytes_fetched"),
            F.countDistinct("payload_md5").alias("distinct_payloads"),
        ).collect()[0]
        stage(
            "fetch",
            n_fetched=out["n_fetched"],
            bytes_fetched=out["bytes_fetched"],
            distinct_payloads=out["distinct_payloads"],
        )


if __name__ == "__main__":
    main()
