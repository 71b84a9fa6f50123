"""Phase split for q_entity_resolution: fuzzy_join pair build vs
star-contraction CC vs the final aggregate.  Times each phase with a
noop sink in one session, reps interleaved-ish (sequential phases but
repeated), probes recorded."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from bench import _cpu_probe, _parallel_probe
from h2h_spark import get_spark
from pyspark.sql import functions as F

from h2h_spark.operators import text as TX
from h2h_spark.operators.dedup import connected_components_star


def phases(spark, sf_dir):
    parts = entrymod._read_table(spark, sf_dir, "part")
    probes = parts.filter(F.col("p_partkey") % 20 == 0).select(
        F.col("p_partkey").alias("probe_key"),
        F.concat(F.lit("z"), F.expr("substr(p_name, 2)")).alias("probe_name"),
    )
    cat = parts.select("p_partkey", "p_name")

    t0 = time.time()
    pairs = TX.fuzzy_join(probes, cat, "probe_name", "p_name", max_edit=1).select(
        F.col("probe_key").alias("id_a"), F.col("p_partkey").alias("id_b")
    )
    pairs_ck = pairs.localCheckpoint(eager=True)
    t1 = time.time()
    n = pairs_ck.count()
    comp = connected_components_star(pairs_ck)
    comp.write.format("noop").mode("overwrite").save()
    t2 = time.time()
    comp.groupBy(F.col("rep").alias("entity_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    ).write.format("noop").mode("overwrite").save()
    t3 = time.time()
    print(
        f"pairs={n}  fuzzy={t1 - t0:.3f}s  cc_star={t2 - t1:.3f}s  "
        f"agg={t3 - t2:.3f}s  total={t3 - t0:.3f}s",
        flush=True,
    )


if __name__ == "__main__":
    # __main__ guard is load-bearing: _parallel_probe uses multiprocessing
    # spawn, which re-imports the main module in each worker — unguarded
    # top-level get_spark() would fork-bomb JVMs.
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("prof_er")
    spark.range(1000).selectExpr("sum(id)").collect()
    print("probe", _cpu_probe(), _parallel_probe(), flush=True)
    for rep in range(int(sys.argv[1]) if len(sys.argv) > 1 else 3):
        spark.catalog.clearCache()
        phases(spark, sf_dir)
    print("probe", _cpu_probe(), _parallel_probe(), flush=True)
