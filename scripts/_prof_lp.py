"""A/B microbench: label_propagation current vs src-partitioned persist."""
import sys
import time

sys.path.insert(0, "/root/repo")
from h2h_spark import get_spark
from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("prof_lp")
spark.range(1000).selectExpr("sum(id)").collect()

import __spark_entry__ as E

edges = E._pagerank_edges(spark, sf_dir)


def lp_old(edges, iterations=3, src="src", dst="dst"):
    sym = (
        edges.select(src, dst)
        .union(edges.select(F.col(dst).alias(src), F.col(src).alias(dst)))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col(src).alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(iterations):
        cnt = (
            sym.join(labels.withColumnRenamed("node", "__n"),
                     F.col(dst) == F.col("__n"))
            .groupBy(F.col(src).alias("node"), "label")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            cnt.groupBy("node")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"),
                                F.col("label").alias("l"))).alias("b"))
            .select("node", F.col("b.l").alias("label"))
        )
    return labels


def lp_new(edges, iterations=3, src="src", dst="dst"):
    sym = (
        edges.select(src, dst)
        .union(edges.select(F.col(dst).alias(src), F.col(src).alias(dst)))
        .distinct()
        .repartition(F.col(src))
        .persist()
    )
    sym.count()
    labels = (
        sym.select(F.col(src).alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(iterations):
        cnt = (
            sym.join(labels.withColumnRenamed("node", "__n"),
                     F.col(dst) == F.col("__n"))
            .groupBy(F.col(src).alias("node"), "label")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            cnt.groupBy("node")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"),
                                F.col("label").alias("l"))).alias("b"))
            .select("node", F.col("b.l").alias("label"))
        )
    return labels


def run(label, fn):
    for r in range(3):
        t0 = time.time()
        out = fn(edges)
        t1 = time.time()
        out.write.format("noop").mode("overwrite").save()
        print(f"{label} run{r}: build={t1-t0:6.3f}s exec={time.time()-t1:6.3f}s",
              flush=True)
        spark.catalog.clearCache()


run("old", lp_old)
run("new", lp_new)

# value equivalence
a = lp_old(edges).collect()
b = lp_new(edges).collect()
print("rows", len(a), len(b), "equal:",
      sorted(map(tuple, a)) == sorted(map(tuple, b)))
out = lp_new(edges)
out.explain("formatted")
