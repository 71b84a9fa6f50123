"""One-off phase profiler for q_stream_ann_ingest (round 13)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from h2h_spark import get_spark
from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("prof_ann")
spark.range(1000).selectExpr("sum(id)").collect()
spark.range(10).mapInArrow(lambda it: it, "id long").collect()
E._prepare(spark)

from h2h_spark.operators.annstore import (
    ivfpq_probe_stored, ivfpq_encode_assign, ivfpq_upsert,
)

for run in range(2):
    print(f"--- run {run}", flush=True)
    t0 = time.time()
    emb, _books = E._pq_seed_books(spark, sf_dir)
    t1 = time.time(); print(f"  seed books      {t1-t0:7.3f}s", flush=True)
    base_p = E._ivfpq_base_store(spark, sf_dir)
    work = E._work("stream_ann", sf_dir)
    sig = E._src_sig(sf_dir, "embeddings")
    src = os.path.join(work, f"src_{sig}")
    p = f"{work}/live_{sig}"
    E._clone_tree(base_p, p)
    t2 = time.time(); print(f"  base+clone      {t2-t1:7.3f}s", flush=True)
    schema = spark.read.parquet(src).schema

    def _sink(batch_df, batch_id):
        s0 = time.time()
        if batch_df.isEmpty():
            return
        s1 = time.time()
        delta = ivfpq_encode_assign(
            spark, p, batch_df, "vec_id", "embedding",
            m=E._PQ_M, dim=E._PQ_DIM)
        s2 = time.time()
        ivfpq_upsert(spark, p, delta)
        s3 = time.time()
        print(f"    batch {batch_id}: isEmpty={s1-s0:.3f} "
              f"encode_assign={s2-s1:.3f} upsert={s3-s2:.3f}", flush=True)

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
    t3 = time.time(); print(f"  stream drain    {t3-t2:7.3f}s", flush=True)
    qv = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    t4 = time.time(); print(f"  query vec       {t4-t3:7.3f}s", flush=True)
    out = ivfpq_probe_stored(spark, p, qv, m=E._PQ_M, k=E._PQ_K,
                             dim=E._PQ_DIM, n_probe=2, top=10)
    out.write.format("noop").mode("overwrite").save()
    t5 = time.time(); print(f"  probe+noop      {t5-t4:7.3f}s", flush=True)
    print(f"  TOTAL {t5-t0:.3f}s", flush=True)
