"""Data-quality constraint checking (engine extension — the validation
gate a production ingest pipeline runs before publishing a batch;
cf. Schelter et al., "Automating Large-Scale Data Quality Verification",
VLDB 2018 (Deequ) — public).

Design: every row-level constraint (not-null, range, regex, custom
predicate) compiles to one ``SUM(CASE WHEN violated)`` term of a SINGLE
wide aggregate — the whole suite costs one corpus pass regardless of how
many constraints it holds, and the scan's column pruning reads only the
checked columns.  Table-level constraints:

* ``unique`` — ``COUNT(*) - COUNT(DISTINCT cols)`` folded into the same
  wide aggregate (one extra shuffle-free partial-agg term);
* ``referential`` — a broadcast-friendly left-anti count against the
  referenced key set (its own join, unavoidable; AQE broadcasts small
  dimension key sets).

Output is the tiny report table ``(constraint, violations, passed)`` —
never the violating rows themselves (those are a filter the caller can
run per failed constraint; the gate must stay O(|constraints|) output).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    name: str
    kind: str  # not_null | in_range | matches | predicate | unique
    cols: tuple[str, ...] = ()
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None
    predicate: Column | None = None


def not_null(col: str) -> Constraint:
    return Constraint(f"not_null({col})", "not_null", (col,))


def in_range(col: str, lo: float, hi: float) -> Constraint:
    return Constraint(f"in_range({col},{lo},{hi})", "in_range", (col,), lo, hi)


def matches(col: str, pattern: str) -> Constraint:
    return Constraint(f"matches({col})", "matches", (col,), pattern=pattern)


def satisfies(name: str, predicate: Column) -> Constraint:
    return Constraint(f"satisfies({name})", "predicate", predicate=predicate)


def unique(*cols: str) -> Constraint:
    return Constraint(f"unique({','.join(cols)})", "unique", tuple(cols))


def _violation_term(c: Constraint) -> Column:
    if c.kind == "not_null":
        bad = F.col(c.cols[0]).isNull()
    elif c.kind == "in_range":
        col = F.col(c.cols[0])
        bad = col.isNull() | (col < F.lit(c.lo)) | (col > F.lit(c.hi))
    elif c.kind == "matches":
        col = F.col(c.cols[0])
        bad = col.isNull() | ~col.rlike(c.pattern)
    elif c.kind == "predicate":
        bad = ~F.coalesce(c.predicate, F.lit(False))
    else:  # pragma: no cover - guarded by check_constraints
        raise ValueError(c.kind)
    # COALESCE: SUM over zero rows is NULL, and an empty batch must read
    # "0 violations, passed", not "NULL, unknown".
    return F.coalesce(F.sum(F.when(bad, 1).otherwise(0)), F.lit(0)).cast("bigint")


def check_constraints(
    df: DataFrame,
    constraints: list[Constraint],
    *,
    referential: list[tuple[str, str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Run the suite; returns ``(constraint, violations, passed)``.

    ``referential`` entries are ``(name, fk_col, ref_df, ref_col)`` —
    each counts fk values (nulls exempt, per SQL FK semantics) with no
    match in the referenced key set.
    """
    spark = df.sparkSession
    aggs = []
    names = []
    for c in constraints:
        if c.kind == "unique":
            aggs.append(
                (F.count(F.lit(1)) - F.count_distinct(*[F.col(x) for x in c.cols]))
                .cast("bigint")
                .alias(f"v{len(names)}")
            )
        else:
            aggs.append(_violation_term(c).alias(f"v{len(names)}"))
        names.append(c.name)
    if aggs:
        stacked = df.agg(*aggs).select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(n).alias("check_name"),
                            F.col(f"v{i}").alias("violations"),
                        )
                        for i, n in enumerate(names)
                    ]
                )
            ).alias("r")
        ).select("r.check_name", "r.violations")
    else:  # referential-only suite
        stacked = spark.createDataFrame([], "check_name string, violations bigint")
    for name, fk, ref_df, ref_col in referential or []:
        keys = ref_df.select(F.col(ref_col).alias("__k")).distinct()
        cnt = (
            df.filter(F.col(fk).isNotNull())
            .join(keys, F.col(fk) == F.col("__k"), "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
            .select(
                F.lit(f"referential({name})").alias("check_name"), "violations"
            )
        )
        stacked = stacked.unionByName(cnt)
    return stacked.withColumn("passed", F.col("violations") == 0)


def k_anonymity(df: DataFrame, qi_cols: list[str], k: int) -> DataFrame:
    """Privacy audit: k-anonymity over the quasi-identifier columns
    (Sweeney, 2002 — public).  A row is at risk when its QI equivalence
    class holds fewer than ``k`` rows.  One grouping shuffle on the QI
    key, then a single-row report ``(n_groups, n_violating_groups,
    n_rows_at_risk, k_anonymous)`` — O(1) output, the per-class detail
    stays distributed (re-derivable by filtering the same groupBy)."""
    classes = df.groupBy(*[F.col(c) for c in qi_cols]).count()
    return classes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("count") < k, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating_groups"),
        F.sum(F.when(F.col("count") < k, F.col("count")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
    ).withColumn("k_anonymous", F.col("n_violating_groups") == 0)


def randomized_response_counts(
    df: DataFrame,
    truth: Column,
    group_cols: list[str],
    *,
    seed_col: Column,
    keep_mod: int = 4,
) -> DataFrame:
    """Local differential privacy by randomized response (Warner, 1965):
    each row reports its true boolean with probability ``p = 1 - 1/keep_mod``
    and a coin flip otherwise, then the aggregate unbiases the noisy sum:

        E[reported] = p·T + (1-p)·N/2   ⇒   est = (reported - (1-p)·N/2) / p

    The per-row "randomness" is a *portable deterministic* hash of
    ``seed_col`` (md5-derived — :func:`~h2h_spark.operators.dedup
    .portable_hash60`), so the mechanism is auditable and the whole
    pipeline reproduces bit-identically in any engine — the same
    seeded-mechanism discipline as the sampling operators.  (Production
    use swaps the hash for true randomness; the estimator is unchanged.)

    One grouping shuffle; output one row per group:
    ``(…group_cols, n, reported_true, est_true)``.  ``est_true`` is a
    single IEEE expression over two integers, engine-exact.
    """
    from h2h_spark.operators.dedup import portable_hash60

    hk = portable_hash60(seed_col.cast("string"))
    keep = (hk % keep_mod) != 0
    # the coin is the hash bit just above the keep decision's bits
    # (keep_mod is a power of two): (hk mod 2m) >= m  ⇔  bit log2(m) set
    coin = (hk % (2 * keep_mod)) >= keep_mod
    reported = F.when(keep, truth).otherwise(coin)
    p = 1.0 - 1.0 / keep_mod
    half_q = (1.0 - p) / 2.0
    agg = df.select(
        *[F.col(c) for c in group_cols], reported.alias("_rep")
    ).groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("_rep").cast("int")).cast("bigint").alias("reported_true"),
    )
    return agg.withColumn(
        "est_true",
        (F.col("reported_true").cast("double")
         - F.lit(half_q) * F.col("n").cast("double")) / F.lit(p),
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    *,
    n_bins: int = 10,
    width: float = 50.0,
    smooth: float = 1.0,
) -> DataFrame:
    """Population Stability Index drift between a reference snapshot and
    a current snapshot of one numeric feature — the standard production
    drift monitor (PSI > 0.2 ≈ significant shift).  Fixed-width bins
    (last bin open-ended), Laplace-smoothed shares so empty bins never
    divide by zero, per-bin contribution ``(p_cur - p_ref) ·
    ln(p_cur/p_ref)`` rounded to 6 digits (the ppl-query float contract).

    Scale shape: each side is ONE map-side-combined count aggregate over
    an ``n_bins``-bounded key — two scans, two tiny shuffles; the bin
    spine join and the totals broadcast are constant-size.  Nothing here
    grows with rows, so the monitor costs two scans at any corpus size."""
    spark = ref.sparkSession

    def binned(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(
                F.least(
                    F.floor(F.col(col) / width).cast("int"), F.lit(n_bins - 1)
                ).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count("*").alias(name))
        )

    spine = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    j = (
        spine.join(binned(ref, "ref_n"), "bin", "left")
        .join(binned(cur, "cur_n"), "bin", "left")
        .fillna(0, subset=["ref_n", "cur_n"])
    )
    totals = j.agg(
        F.sum("ref_n").alias("__rt"), F.sum("cur_n").alias("__ct")
    )
    j = j.crossJoin(F.broadcast(totals))
    denom = float(smooth) * n_bins
    pr = (F.col("ref_n") + F.lit(float(smooth))) / (F.col("__rt") + F.lit(denom))
    pc = (F.col("cur_n") + F.lit(float(smooth))) / (F.col("__ct") + F.lit(denom))
    return j.select(
        "bin",
        "ref_n",
        "cur_n",
        F.round((pc - pr) * F.log(pc / pr), 6).alias("psi_bin"),
    ).orderBy("bin")


def psi_drift_multi(
    ref: DataFrame,
    cur: DataFrame,
    features: dict[str, tuple[str, float]],
    *,
    n_bins: int = 10,
    smooth: float = 1.0,
) -> DataFrame:
    """PSI drift for MANY features in one scan per side: ``features``
    maps feature name -> (column, bin width).  Each side melts its
    feature columns into (feature, bin) pairs scan-side (Expand — no
    extra pass per feature) and aggregates once; per-feature totals are
    a |features|-row broadcast.  Output one row per (feature, bin) with
    the same smoothed, 6-digit-rounded contribution as
    :func:`psi_drift` — the shape that lets a daily drift monitor cover
    a whole feature table in exactly two scans at any corpus size."""
    spark = ref.sparkSession
    items = sorted(features.items())

    def binned(df: DataFrame, name: str) -> DataFrame:
        pairs = F.array(*[
            F.struct(
                F.lit(fname).alias("feature"),
                F.least(
                    F.floor(F.col(col) / F.lit(width)).cast("int"),
                    F.lit(n_bins - 1),
                ).alias("bin"),
            )
            for fname, (col, width) in items
        ])
        return (
            df.select(F.explode(pairs).alias("fb"))
            .groupBy(F.col("fb.feature").alias("feature"), F.col("fb.bin").alias("bin"))
            .agg(F.count("*").alias(name))
        )

    spine = (
        spark.createDataFrame([(f,) for f, _ in items], "feature string")
        .crossJoin(
            spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
        )
    )
    j = (
        spine.join(binned(ref, "ref_n"), ["feature", "bin"], "left")
        .join(binned(cur, "cur_n"), ["feature", "bin"], "left")
        .fillna(0, subset=["ref_n", "cur_n"])
    )
    totals = j.groupBy("feature").agg(
        F.sum("ref_n").alias("__rt"), F.sum("cur_n").alias("__ct")
    )
    j = j.join(F.broadcast(totals), "feature")
    denom = float(smooth) * n_bins
    pr = (F.col("ref_n") + F.lit(float(smooth))) / (F.col("__rt") + F.lit(denom))
    pc = (F.col("cur_n") + F.lit(float(smooth))) / (F.col("__ct") + F.lit(denom))
    return j.select(
        "feature",
        "bin",
        "ref_n",
        "cur_n",
        F.round((pc - pr) * F.log(pc / pr), 6).alias("psi_bin"),
    )
