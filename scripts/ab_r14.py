"""Interleaved A/B: r13 in-row formulations vs their pre-r13 shuffle forms.

VERDICT r13 item 1: the driver bench showed q_simhash_pairs 1.58 -> 3.67 s
on a touched path while the builder's same-box A/B said the rewrite is
faster; BENCH medians are sequential across ~30 min so the host's speed
band (see BASELINE.md) can hit one side only.  This script re-adjudicates
in the driver's own methodology but INTERLEAVED: both formulations run
alternately in one Spark session, >=5 reps each, with the bench's own CPU
probes recorded before/after so the band is visible.

The OLD formulations are reconstructed verbatim from the pre-r13 commits
(simhash64 pre-f324af6: explode + groupBy collect_list; winnow pre-33265c1:
explode + per-doc window + distinct) and monkeypatched into the operator
module, so both sides run the identical end-to-end declared query.

Usage: python scripts/ab_r14.py <simhash|winnow> [reps]   (default reps 5)
Honors SPARK_GRAFT_CPUS (run at 32 and 8 per the verdict).
Writes plans/r14/ab_<case>_c<cpus>.json.
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
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def old_simhash64(df, id_col, text_col, base_hash="xxhash64"):
    """Pre-f324af6 formulation: explode tokens, per-token hash, groupBy
    collect_list, then the same per-bit aggregate over the collected
    array."""
    from h2h_spark.operators.dedup import _base_hash, tokens

    nbits = 60 if base_hash == "md5" else 63
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).select(id_col, _base_hash("tok", base_hash).alias("__h"))
    hs = tok.groupBy(id_col).agg(F.collect_list("__h").alias("hs"))
    return hs.selectExpr(
        id_col,
        f"""
        aggregate(
          zip_with(
            transform(sequence(0, {nbits - 1}), j ->
              aggregate(hs, 0L, (acc, h) ->
                acc + (CAST(shiftright(h, j) & 1 AS BIGINT) * 2 - 1))),
            sequence(0, {nbits - 1}),
            (s, j) -> IF(s > 0, shiftleft(1L, j), 0L)),
          0L, (acc, x) -> acc + x) AS simhash
        """,
    )


def old_winnow_fingerprints(df, id_col, text_col, *, k=5, window=4):
    """Pre-33265c1 formulation: explode every k-gram, per-doc window
    struct-min (id-keyed Exchange + Sort + Window), then distinct."""
    from pyspark.sql.window import Window

    from h2h_spark.operators.text import tokens

    base = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("__t"))
    base = base.filter(F.size("__t") >= k + window - 1)
    n = F.size("__t")
    grams = base.select(
        "id",
        (n - k + 1).cast("int").alias("m"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda p: F.struct(
                    p.cast("int").alias("pos"),
                    F.md5(
                        F.array_join(F.slice("__t", p, k), " ")
                    ).alias("gh"),
                ),
            )
        ).alias("g"),
    ).select("id", "m", F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh"))
    w = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    sel = (
        grams.withColumn(
            "__sel",
            F.min(F.struct(F.col("gh"), (-F.col("pos")).alias("np"))).over(w),
        )
        .filter(F.col("pos") <= F.col("m") - (window - 1))
        .select(
            F.col("id").alias(id_col),
            (-F.col("__sel.np")).cast("bigint").alias("pos"),
            F.col("__sel.gh").alias("fp"),
        )
        .distinct()
    )
    return sel


CASES = {
    "simhash": ("q_simhash_pairs", "h2h_spark.operators.dedup", "simhash64",
                old_simhash64),
    "winnow": ("q_winnow_pairs", "h2h_spark.operators.text",
               "winnow_fingerprints", old_winnow_fingerprints),
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
    spark = get_spark(f"ab_r14_{case}")
    spark.range(1000).selectExpr("sum(id)").collect()
    fn = entrymod.queries()[qname]

    def run(variant_fn) -> float:
        setattr(mod, attr, variant_fn)
        spark.catalog.clearCache()
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    # one untimed warm pass per variant so neither side pays first-run
    # codegen/file-listing setup inside its reps
    run(old_fn)
    run(new_fn)

    times: dict[str, list[float]] = {"old": [], "new": []}
    for r in range(reps):
        # alternate the order each rep so drift within a rep is symmetric
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
