"""Executable end-to-end CRAWL→CORPUS pipeline on the engine.

The round-6 crawl tier composed the way a web-data team would run it:

  WARC ingest (split-realigned scan) → record-type gate → URL
  canonicalization + canonical-URL dedup → robots.txt admission →
  per-domain caps → quality gate → HTML text extraction → text
  normalization → content-defined chunking → chunk-level exact dedup →
  per-host corpus accounting.

Every stage is an operator the graded queries exercise
(q_warc_scan/q_url_canon/q_robots_filter/q_domain_cap/q_html_extract/
q_text_norm/q_content_chunks/q_crawl_pipeline); this file shows them
composed over a synthesized mini-crawl.

    python examples/crawl_to_corpus.py [sf_dir]

Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from h2h_spark import get_spark


def log(stage: str, **kw) -> None:
    print(json.dumps({"stage": stage, **kw}))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("crawl_to_corpus", cpus=8)
    work = "/tmp/crawl_to_corpus"
    os.makedirs(work, exist_ok=True)

    # --- 1. synthesize a mini-crawl: one WARC file per partition -------
    from h2h_spark.sources.warc import read_warc, write_warc_records

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = docs.select("doc_id", "text").collect()
    recs = []
    for r in rows:
        body = f"<html><head><title>Doc {r.doc_id}</title></head><body><p>{r.text}</p><a href=\"/next\">n</a></body></html>"
        recs.append((
            {
                "WARC-Type": "metadata" if r.doc_id % 10 == 0 else "response",
                "WARC-Record-ID": f"<urn:c:{r.doc_id}>",
                "WARC-Target-URI":
                    f"HTTPS://Ex-{r.doc_id % 20}.ORG:443/page/{r.doc_id % 100}"
                    f"?utm_source=crawl&ref={r.doc_id % 3}",
            },
            body.encode(),
        ))
    write_warc_records(f"{work}/crawl.warc", recs)
    log("ingest_fixture", n_records=len(recs))

    # --- 2. WARC scan with forced small splits -------------------------
    scanned = read_warc(spark, f"{work}/crawl.warc", max_partition_bytes=16384)
    n_scanned = scanned.count()
    log("warc_scan", n_records=n_scanned,
        n_tasks=scanned.rdd.getNumPartitions())

    # --- 3. record gate + URL canonicalization + URL dedup -------------
    from h2h_spark.operators.urlnorm import crawl_url_dedup

    resp = scanned.filter(F.col("warc_type") == "response").select(
        F.regexp_extract("record_id", r"urn:c:(\d+)", 1).cast("bigint")
        .alias("doc_id"),
        F.col("target_uri").alias("url"),
        "content_length",
    )
    dedup = crawl_url_dedup(resp, "url", "doc_id")
    n_urls = dedup.count()
    n_unique = dedup.filter("is_winner").count()
    log("url_canon_dedup", n_fetched=n_urls, n_canonical=n_unique)
    kept = dedup.filter("is_winner")

    # --- 4. robots admission + domain caps ------------------------------
    from h2h_spark.operators.robots import robots_filter
    from h2h_spark.operators.urlnorm import cap_per_domain, url_host

    urls = kept.withColumn("host", url_host(F.col("url_canon"))).withColumn(
        "path", F.regexp_extract("url_canon", r"^[a-z]+://[^/]*(/[^?#]*)", 1)
    )
    rules = spark.createDataFrame(
        [(f"ex-{k}.org", "/page/1", False) for k in range(20)],
        ["host", "pattern", "allow"],
    )
    admitted = robots_filter(urls, rules, id_col="doc_id").filter("allowed")
    capped = cap_per_domain(admitted, "url_canon", "doc_id", cap=5)
    log("robots_and_caps", n_admitted=admitted.count(), n_capped=capped.count())

    # --- 5. HTML extraction + normalization ------------------------------
    from h2h_spark.operators.text import extract_html_text, normalize_text

    payloads = capped.join(docs, "doc_id").withColumn(
        "html",
        F.concat(F.lit("<html><body><p>"), F.col("text"),
                 F.lit("</p></body></html>")),
    )
    extracted = extract_html_text(payloads, "html")
    normed = normalize_text(extracted, "body_text", out_col="clean_text")
    log("extract_normalize", n_docs=normed.count())

    # --- 6. content-defined chunking + chunk dedup -----------------------
    from h2h_spark.operators.dedup import content_defined_chunks, exact_dedup

    chunks = content_defined_chunks(
        normed.select("doc_id", F.col("clean_text").alias("t")),
        "doc_id", "t", mask_bits=5,
    )
    uniq = exact_dedup(chunks, ["chunk_md5"], "doc_id")
    log("chunk_dedup", n_chunks=chunks.count(), n_unique_chunks=uniq.count())

    # --- 7. per-host corpus accounting -----------------------------------
    acct = (
        capped.groupBy("host")
        .agg(F.count("*").alias("docs"),
             F.sum("content_length").alias("bytes"))
        .orderBy("host")
    )
    for r in acct.collect()[:5]:
        log("corpus", host=r.host, docs=r.docs, bytes=int(r.bytes))
    log("done", hosts=acct.count())


if __name__ == "__main__":
    main()
