"""Deterministic sampling / splitting for training-data pipelines (engine
extension, SURVEY.md §2.3 adjacent: the ops a 100 TB corpus needs between
dedup and training).

Everything keys off the engine-portable md5 hash
(:func:`h2h_spark.operators.dedup.portable_hash60`), so split membership
is reproducible across engines and runs — the property a train/val/test
split must have (a reshuffle-dependent split silently leaks validation
data between retrainings).  All expressions are built-in Spark SQL — one
narrow projection for splits, one window shuffle for group caps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from h2h_spark.operators.dedup import portable_hash60

_BUCKETS = 10_000


def split_bucket(key: Column | str) -> Column:
    """Stable 0..9999 bucket for a key — the md5-portable split basis."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(portable_hash60(c.cast("string")), F.lit(_BUCKETS))


def hash_split(
    df: DataFrame, key_col: str, splits: dict[str, float]
) -> DataFrame:
    """Assign every row to a named split by hashed key: ``splits`` maps
    name → fraction (must sum to ~1).  Deterministic, engine-portable, and
    stable under repartition/insert — new rows never move old rows between
    splits (the reason modulo-hash beats ``randomSplit`` for corpus
    curation)."""
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = split_bucket(key_col)
    expr: Column | None = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = bucket < int(round(acc * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn("split", expr)


def cluster_safe_split(
    df: DataFrame, id_col: str, pairs: DataFrame, splits: dict[str, float]
) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split: rows linked by ``pairs``
    (near-duplicate edges) are first resolved to connected components,
    then the WHOLE component is split by its representative's hash — a
    near-dup of a training document can never land in the eval split,
    the leakage a plain per-row hash split silently permits (the
    standard decontamination failure in corpus curation).  Unlinked rows
    split by their own id, so the assignment is exactly
    :func:`hash_split` on ``coalesce(rep, id)``.

    Scale shape: the component pass is the min-label CC (pair-graph
    sized, not corpus sized); the corpus itself takes ONE keyed left
    join against the |linked-ids|-row component table (broadcast when
    small) and a scan-side hash — no extra shuffle of the corpus."""
    from .dedup import connected_components

    comp = connected_components(pairs).withColumnRenamed("id", "__cid")
    j = df.join(comp, F.col(id_col) == F.col("__cid"), "left")
    keyed = j.withColumn("__skey", F.coalesce(F.col("rep"), F.col(id_col)))
    return hash_split(keyed, "__skey", splits).drop("__cid", "rep", "__skey")


def group_cap_sample(
    df: DataFrame, group_cols: list[str], key_col: str, cap: int
) -> DataFrame:
    """At most ``cap`` rows per group, chosen deterministically by hashed
    key (a uniform subsample of each group, not head-of-file bias) — the
    per-domain / per-language balancing step of corpus curation.  One
    window shuffle on the group key; skewed groups are bounded by the cap
    itself."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy(
        split_bucket(key_col), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a hashed-key fraction
    ``rates[stratum]`` of each stratum (``default_rate`` for strata not
    listed) — the language/domain rebalancing step of corpus curation
    (e.g. downsample the 60% English share, keep all of a rare language).

    Same md5-portable bucket as :func:`hash_split`, so membership is
    reproducible cross-engine and stable under growth: a document's
    keep/drop never changes when other rows arrive.  One narrow
    filter-at-scan projection — no shuffle, no sort, no per-stratum
    scan."""
    bucket = split_bucket(key_col)
    thr = None
    for name, rate in sorted(rates.items()):
        t = int(round(rate * _BUCKETS))
        cond = F.col(strata_col) == name
        thr = F.when(cond, F.lit(t)) if thr is None else thr.when(cond, F.lit(t))
    default = int(round(default_rate * _BUCKETS))
    thr = F.lit(default) if thr is None else thr.otherwise(F.lit(default))
    return df.filter(bucket < thr)


def mix_to_token_budget(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    cost_col: str,
    budget: int,
    weights: dict[str, float] | None = None,
    totals: dict[str, float] | None = None,
) -> DataFrame:
    """Rebalance a corpus to a target mixture under a total token budget —
    the "data mixing" step of training-set assembly (e.g. 30% code, 50%
    web, 20% books at 1T tokens total).

    ``weights`` maps stratum → target share of ``budget`` (default:
    uniform across observed strata).  Each stratum keeps the hashed-key
    fraction ``min(1, budget*w / stratum_total_cost)`` of its rows, so the
    expected kept cost approaches the target share without a sort or a
    running total.  Two passes: one tiny per-stratum aggregate (stratum
    cardinality = #sources/#languages — driver-safe at any corpus size),
    then one narrow filter at scan with literal thresholds (predicate
    pushdown survives).  Membership is md5-portable and stable under
    corpus growth, like :func:`stratified_sample`.

    The keep-rate arithmetic is fixed double-precision ops in a fixed
    order (``(budget * w) / total`` then ``floor(r*10000 + 0.5)``) so an
    external oracle doing the same math lands on the identical threshold.

    ``totals`` overrides the per-stratum cost basis — pass a
    sketch-estimated table (e.g. the DEDUP-AWARE token mass from
    :func:`~h2h_spark.operators.sketch.kmv_weighted_sum`) so duplicated
    boilerplate doesn't inflate a stratum's share; by default the basis
    is the raw per-stratum cost sum.
    """
    import math

    # A stratum whose costs are all NULL sums to NULL — treat it (and a
    # zero total) as rate 0; the SQL oracle mirrors this with `WHERE t > 0`
    # so both sides drop degenerate strata identically.
    if totals is None:
        totals = {
            r[0]: (float(r[1]) if r[1] is not None else 0.0)
            for r in df.groupBy(strata_col).agg(F.sum(F.col(cost_col))).collect()
        }
    n = len(totals)
    thr: Column | None = None
    for name in sorted(totals):
        w = weights.get(name, 0.0) if weights is not None else 1.0 / n
        total = totals[name]
        rate = min(1.0, (float(budget) * w) / total) if total > 0 else 0.0
        t = int(math.floor(rate * _BUCKETS + 0.5))
        cond = F.col(strata_col) == name
        thr = F.when(cond, F.lit(t)) if thr is None else thr.when(cond, F.lit(t))
    thr = F.lit(0) if thr is None else thr.otherwise(F.lit(0))
    return df.filter(split_bucket(key_col) < thr)


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    n_parts: int | None = None,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``(id, pos)``: a reproducible global permutation of the corpus —
    the epoch-shuffle step of a training-data loader.  ``pos`` is the
    row's 0-based position in the order of ``md5(seed || '|' || id)``,
    so the permutation is stable across runs, cluster sizes, and input
    partitionings, and changing ``seed`` draws an independent shuffle.

    The naive plan (ROW_NUMBER over a global window) serializes the
    corpus through one task, and a range-partitioned prefix rank (as in
    :mod:`h2h_spark.operators.packing`) pays a boundary-sampling pass.
    Neither is needed here: the shuffle key is a uniform md5 hex string,
    so its leading ``bucket_hex`` characters ARE a deterministic,
    skew-free range partitioning.  Plan: (1) one tiny grouped count per
    bucket (≤ 16^bucket_hex rows), prefix-summed on the driver in bucket
    order and broadcast back; (2) rank within each bucket with a
    bucket-partitioned window; ``pos = bucket_offset + local_rank - 1``.
    Two column-pruned scans of the id column, one shuffle, no sampling,
    no persist.  md5 keys are unique per id at any realistic corpus
    size; ``id`` breaks hypothetical ties deterministically.

    The key is md5-over-text so an external SQL oracle reproduces the
    permutation bit-exactly: ``ROW_NUMBER() OVER (ORDER BY
    md5(seed || '|' || CAST(id AS VARCHAR)), id) - 1``.

    ``carry_cols`` rides payload columns through the permutation so a
    downstream consumer (e.g. sequence packing) doesn't pay a
    corpus-sized rejoin on id.
    """
    from pyspark.sql.window import Window

    spark = df.sparkSession
    bucket_hex = 2 if n_parts is None or n_parts <= 256 else 4
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.md5(
            F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string"))
        ).alias("__k"),
        *[F.col(c) for c in carry_cols],
    ).withColumn("__b", F.substring("__k", 1, bucket_hex))
    counts = {
        r["__b"]: r["c"]
        for r in keyed.groupBy("__b").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(counts):
        offsets.append((b, acc))
        acc += counts[b]
    off_df = spark.createDataFrame(offsets, "__b string, __off long")
    w = Window.partitionBy("__b").orderBy("__k", "id")
    return (
        keyed.join(F.broadcast(off_df), "__b")
        .withColumn("__rn", F.row_number().over(w))
        .select(
            F.col("id").alias(id_col),
            (F.col("__off") + F.col("__rn") - 1).cast("bigint").alias("pos"),
            *[F.col(c) for c in carry_cols],
        )
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight: Column | str,
    k: int,
    *,
    seed: str = "ws",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement by exponential keys
    (Efraimidis & Spirakis, "Weighted random sampling with a reservoir",
    IPL 2006 — public; the A-ES scheme): each row draws
    ``e_i = -ln(u_i) / w_i`` and the k SMALLEST keys win — exactly
    probability-proportional-to-weight without-replacement sampling.

    ``u_i`` is an engine-portable md5-derived uniform (identical bits in
    any engine with md5), keys are rounded to 9 digits with an id
    tie-break before the cut so a 1-ulp ``ln`` divergence between libm
    implementations cannot flip the selection, and the k-smallest cut is
    a TakeOrdered (no global sort materialization).  Non-positive
    weights are excluded (a zero weight means "never sample").
    Returns ``(id, weight, es_key)``.
    """
    c_id = F.col(id_col)
    w = (F.col(weight) if isinstance(weight, str) else weight).cast("double")
    h = portable_hash60(F.concat(F.lit(seed + "|"), c_id.cast("string")))
    # (0, 1]: +1 lifts off zero; /2^60 (a power of two) is exact, and the
    # int->double rounding of h is IEEE-identical in any engine
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    key = -F.log(u) / w
    return (
        df.filter(w > 0)
        .select(
            c_id.alias("id"),
            w.alias("weight"),
            F.round(key, 9).alias("es_key"),
        )
        .orderBy("es_key", "id")
        .limit(k)
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight: Column | str,
    k: int,
    *,
    seed: str = "ws",
) -> DataFrame:
    """Per-group A-ES weighted sampling without replacement: the k
    smallest exponential keys WITHIN each group win — one window
    shuffle on the group key, no per-group driver loops.  Same portable
    key construction (and the same 9-digit rounding + id tie-break) as
    :func:`weighted_sample`.  Returns ``(group, id, weight, es_key)``."""
    from pyspark.sql import Window

    c_id = F.col(id_col)
    w = (F.col(weight) if isinstance(weight, str) else weight).cast("double")
    h = portable_hash60(F.concat(F.lit(seed + "|"), c_id.cast("string")))
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    key = F.round(-F.log(u) / w, 9)
    return (
        df.filter(w > 0)
        .select(
            F.col(group_col).alias("grp"),
            c_id.alias("id"),
            w.alias("weight"),
            key.alias("es_key"),
        )
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy("grp").orderBy("es_key", "id")
        ))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def negative_sample(
    positives: DataFrame,
    universe: DataFrame,
    anchor_col: str,
    item_col: str,
    k: int,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for each
    (anchor, positive-item) row, draw ``k`` pseudo-random items from the
    universe by PORTABLE hash (md5-derived), reproducible in any engine.

    The universe is densely indexed once (row_number over item order —
    one sort of the item table, usually a dimension-sized side), then
    negatives resolve by an equi-join on ``idx = H(anchor, j) mod N``.
    Collisions with the true positive are kept and marked
    (``is_collision``) rather than resampled — resampling loops are
    nondeterministic under distribution; downstream drops or re-weights.

    Output: ``(anchor, j, neg_item, is_collision)``.
    """
    from pyspark.sql.window import Window

    from h2h_spark.operators.dedup import portable_hash60

    idx = universe.select(F.col(item_col).alias("neg_item")).distinct()
    idx = idx.withColumn(
        "idx", F.row_number().over(Window.orderBy("neg_item")).cast("bigint")
    )
    n = idx.count()
    draws = positives.select(
        F.col(anchor_col).alias("anchor"),
        F.col(item_col).alias("pos_item"),
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"),
    )
    draws = draws.withColumn(
        "idx",
        portable_hash60(
            F.concat_ws("|", F.col("anchor").cast("string"),
                        F.col("j").cast("string"))
        ) % F.lit(n) + 1,
    )
    return draws.join(idx, "idx").select(
        "anchor",
        "j",
        "neg_item",
        (F.col("neg_item") == F.col("pos_item")).alias("is_collision"),
    )
