"""One-off phase profiler for q_stream_dedup_index (round 13)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from h2h_spark import get_spark
from pyspark.sql import functions as F
from h2h_spark.operators import dedup as D

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("prof_sdi")
spark.range(1000).selectExpr("sum(id)").collect()
spark.range(10).mapInArrow(lambda it: it, "id long").collect()
E._prepare(spark)

T = [time.time()]
def mark(label):
    T.append(time.time())
    print(f"  {label:45s} {T[-1]-T[-2]:7.3f}s", flush=True)

for run in range(2):
    print(f"--- run {run}")
    T[:] = [time.time()]
    import glob as _g
    import shutil

    docs = spark.read.parquet(E._t(sf_dir, "documents"))
    _, _, boundary = E._minhash_index_tables(spark, sf_dir)
    mark("index tables (cached fixture)")
    work = E._work("q_stream_dedup_index", sf_dir)
    sig = E._src_sig(sf_dir, "documents")
    src = os.path.join(work, f"src_{sig}")
    base = E._work("minhash_index", sf_dir)
    live_e = os.path.join(work, "live_entries")
    live_s = os.path.join(work, "live_sets")
    pairs_dir = os.path.join(work, "pairs")
    if os.path.exists(pairs_dir):
        shutil.rmtree(pairs_dir)
    E._clone_tree(os.path.join(base, f"entries_{sig}"), live_e)
    E._clone_tree(os.path.join(base, f"sets_{sig}"), live_s)
    mark("clone trees")

    def _sink(batch_df, batch_id):
        t0 = time.time()
        if batch_df.isEmpty():
            return
        t1 = time.time()
        stage_e = os.path.join(work, f"stage_e_{batch_id}")
        stage_s = os.path.join(work, f"stage_s_{batch_id}")
        de, ds = D.minhash_index(batch_df, "doc_id", "text", base_hash="md5")
        de.write.mode("overwrite").parquet(stage_e)
        t2 = time.time()
        ds.write.mode("overwrite").parquet(stage_s)
        t3 = time.time()
        e = spark.read.parquet(live_e)
        s = spark.read.parquet(live_s)
        pairs = D.minhash_pairs_from_tables(
            spark.read.parquet(stage_e), spark.read.parquet(stage_s),
            e, s, jaccard_threshold=0.5,
        )
        pairs.write.mode("append").parquet(pairs_dir)
        t4 = time.time()
        for stage, live in ((stage_e, live_e), (stage_s, live_s)):
            for pf in _g.glob(os.path.join(stage, "part-*.parquet")):
                shutil.move(pf, os.path.join(live, os.path.basename(pf)))
            shutil.rmtree(stage)
        t5 = time.time()
        print(f"    batch {batch_id}: isEmpty={t1-t0:.3f} wr_entries={t2-t1:.3f} "
              f"wr_sets={t3-t2:.3f} pairs={t4-t3:.3f} publish={t5-t4:.3f}",
              flush=True)

    schema = spark.read.parquet(src).schema
    mark("read src schema")
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(_sink)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    mark("stream drain total")
    out = spark.read.parquet(pairs_dir)
    rows = out.collect()
    df = spark.createDataFrame(rows, out.schema).select("id_a", "id_b", "jaccard")
    mark("collect+rebuild")
    df.write.format("noop").mode("overwrite").save()
    mark("noop write")
    print(f"  TOTAL {T[-1]-T[0]:.3f}s  rows={len(rows)}")
