"""Interleaved A/B for the round-14 continuation changes: each case
monkeypatches the OLD formulation (reconstructed verbatim from the
pre-change commit) into the operator module and alternates old/new runs
of the declared query in ONE Spark session, >=5 reps, medians compared,
CPU/parallel probes recorded (BASELINE.md band discipline).

Usage: python scripts/ab_r14b.py <case> [reps]     (default reps 5)
Honors SPARK_GRAFT_CPUS.  Writes plans/r14/ab_<case>_c<cpus>.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from bench import _cpu_probe, _parallel_probe
from h2h_spark import get_spark
from pyspark.sql import functions as F


def old_dbscan_2d(pts, id_col, x_col, y_col, eps, min_pts):
    """Pre-change formulation: no persist of the symmetrized neighbor
    list / core set — the grid self-join re-runs for each of its three
    consumers."""
    from h2h_spark.operators.dedup import connected_components_star
    from h2h_spark.operators.spatial import grid_self_join

    pairs = grid_self_join(pts, id_col, x_col, y_col, eps)
    sym = pairs.select(
        F.col("a_id").alias("id"), F.col("b_id").alias("nb")
    ).unionByName(
        pairs.select(F.col("b_id").alias("id"), F.col("a_id").alias("nb"))
    )
    deg = sym.groupBy("id").agg(F.count("*").alias("n_nb"))
    core = deg.filter(F.col("n_nb") + 1 >= min_pts).select("id")
    core_edges = (
        sym.join(core.withColumnRenamed("id", "nb"), "nb")
        .join(core, "id")
        .select(F.col("id").alias("id_a"), F.col("nb").alias("id_b"))
    )
    comp = connected_components_star(core_edges)
    core_lab = core.join(comp, "id", "left").select(
        "id", F.coalesce(F.col("rep"), F.col("id")).alias("cluster")
    )
    border = (
        sym.join(core_lab.withColumnRenamed("id", "nb"), "nb")
        .join(core, "id", "left_anti")
        .groupBy("id")
        .agg(F.min("cluster").alias("cluster"))
    )
    labeled = core_lab.withColumn("role", F.lit("core")).unionByName(
        border.withColumn("role", F.lit("border"))
    )
    return (
        pts.select(F.col(id_col).alias("id"))
        .join(labeled, "id", "left")
        .select(
            "id",
            "cluster",
            F.coalesce(F.col("role"), F.lit("noise")).alias("role"),
        )
    )


def old_cc_star(pairs, id_a="id_a", id_b="id_b", max_iter=30):
    """Pre-change formulation: edge-list working set — window-min over u
    (shuffle + per-group sort) plus a distinct re-dedup (second shuffle)
    per half-round."""
    from pyspark.sql import Window as PsWindow

    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    e = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _withm(edges):
        return edges.withColumn(
            "m", F.least(F.min("v").over(PsWindow.partitionBy("u")), F.col("u"))
        )

    def _sym(d):
        return (
            d.filter(F.col("u") != F.col("v"))
            .unionByName(d.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _edge_sig(d):
        r = d.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    sig_e = _edge_sig(e)
    for it in range(max_iter):
        ls = (
            _withm(e)
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        e1 = _sym(ls).localCheckpoint(eager=False)
        e1m = _withm(e1)
        ss = e1m.filter(F.col("v") < F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        centers = e1m.select(F.col("u"), F.col("m").alias("v"))
        e2 = _sym(ss.unionByName(centers)).localCheckpoint(eager=False)
        sig2 = _edge_sig(e2)
        if sig2 == sig_e:
            if e2.exceptAll(e).unionAll(e.exceptAll(e2)).count() == 0:
                e = e2
                break
        e = e2
        sig_e = sig2
    else:
        raise ValueError("no fixed point")
    stars = e.filter(F.col("v") < F.col("u")).select(
        F.col("u").alias("id"), F.col("v").alias("rep")
    )
    reps = stars.select(F.col("rep").alias("id")).distinct().select(
        "id", F.col("id").alias("rep")
    )
    return stars.unionByName(reps)


CASES = {
    "dbscan": ("q_dbscan", "h2h_spark.operators.spatial", "dbscan_2d",
               old_dbscan_2d),
    "ccstar_components": ("q_components_star", "h2h_spark.operators.dedup",
                          "connected_components_star", old_cc_star),
    "ccstar_er": ("q_entity_resolution", "h2h_spark.operators.dedup",
                  "connected_components_star", old_cc_star),
    "ccstar_dbscan": ("q_dbscan", "h2h_spark.operators.dedup",
                      "connected_components_star", old_cc_star),
}


def main() -> None:
    case = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    qname, modname, attr, old_fn = CASES[case]
    import importlib

    mod = importlib.import_module(modname)
    new_fn = getattr(mod, attr)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    probe0 = [_cpu_probe(), _parallel_probe()]
    spark = get_spark(f"ab_r14b_{case}")
    spark.range(1000).selectExpr("sum(id)").collect()
    fn = entrymod.queries()[qname]

    def run(variant_fn) -> float:
        setattr(mod, attr, variant_fn)
        spark.catalog.clearCache()
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    run(old_fn)
    run(new_fn)

    times: dict[str, list[float]] = {"old": [], "new": []}
    for r in range(reps):
        order = [("old", old_fn), ("new", new_fn)]
        if r % 2 == 1:
            order.reverse()
        for label, vf in order:
            t = run(vf)
            times[label].append(t)
            print(f"rep{r} {label}: {t:.3f}s", flush=True)
    setattr(mod, attr, new_fn)

    out = {
        "case": case,
        "query": qname,
        "cpus": cpus,
        "reps": reps,
        "sf_dir": sf_dir,
        "old": times["old"],
        "new": times["new"],
        "old_median": statistics.median(times["old"]),
        "new_median": statistics.median(times["new"]),
        "cpu_probe_sec": [probe0[0], _cpu_probe()],
        "parallel_probe_sec": [probe0[1], _parallel_probe()],
    }
    path = f"/root/repo/plans/r14/ab_{case}_c{cpus}.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
