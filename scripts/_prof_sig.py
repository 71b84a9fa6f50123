"""A/B microbench: explode+groupBy vs in-array minhash signatures."""
import sys
import time

sys.path.insert(0, "/root/repo")
from h2h_spark import get_spark
from pyspark.sql import functions as F
from h2h_spark.operators import dedup as D
from h2h_spark.operators.dedup import (
    _MERSENNE, _base_hash, _hash_params, shingle_sets,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("prof_sig")
spark.range(1000).selectExpr("sum(id)").collect()

docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
n = docs.count()
delta = docs.filter(F.col("doc_id") >= int(n * 0.8))
print("rows total", n, "delta", delta.count())


def sig_old(df, id_col, text_col, num_hashes=64, shingle_k=4, seed=42,
            base_hash="md5"):
    params = _hash_params(num_hashes, seed)
    sets = shingle_sets(df, id_col, text_col, shingle_k)
    sh = sets.select(
        F.col("id").alias(id_col), F.explode("sh").alias("shingle")
    ).select(id_col, F.pmod(_base_hash("shingle", base_hash),
                            F.lit(_MERSENNE)).alias("__h"))
    aggs = [
        F.min(F.pmod(F.col("__h") * F.lit(a) + F.lit(b),
                     F.lit(_MERSENNE))).alias(f"h{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col,
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def run(label, fn, df):
    for r in range(3):
        t0 = time.time()
        out = fn(df, "doc_id", "text", base_hash="md5")
        out.write.format("noop").mode("overwrite").save()
        print(f"{label} run{r}: {time.time()-t0:6.3f}s", flush=True)


run("old-delta", sig_old, delta)
run("new-delta", D.minhash_signatures, delta)
run("old-full ", sig_old, docs)
run("new-full ", D.minhash_signatures, docs)
