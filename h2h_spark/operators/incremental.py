"""Incremental aggregate maintenance — the materialized-view path.

At 100 TB you do not recompute a per-key aggregate because a day of new
rows arrived; you keep a per-key PARTIAL state (sum/count per measure —
commutative, mergeable) and fold each delta batch into it:

    state' = merge(state, partial_agg(delta))

Both sides are aggregates, so the merge is a union + one re-aggregate on
the key — work proportional to |state| + |delta|, never to the history.
That is exactly Spark's own partial-aggregation contract (map-side
partials merged by the final agg), lifted to a stored table boundary.
Decimal sums keep the fold bit-exact: merging in any order equals the
one-shot aggregate over the full input, which is what the oracle checks.

avg is derived (sum/count) at read time — never stored — so the state
stays mergeable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(df: DataFrame, keys: list[str], measures: dict[str, str]) -> DataFrame:
    """Per-key partial-aggregate state: for each measure column, an exact
    decimal sum (``<m>_sum``) plus a row count (``n_rows``).  ``measures``
    maps column → decimal type to accumulate in (e.g. ``"decimal(18,2)"``)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, dec in measures.items():
        aggs.append(F.sum(F.col(col).cast(dec)).alias(f"{col}_sum"))
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_state(state: DataFrame, delta_state: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a delta's partial state into the stored state: union + one
    keyed re-aggregate (sum-of-sums, sum-of-counts).  New keys appear,
    untouched keys pass through; cost is |state| + |delta|."""
    merged = state.unionByName(delta_state, allowMissingColumns=False)
    sums = [
        F.sum(F.col(c)).alias(c)
        for c in state.columns
        if c not in keys
    ]
    return merged.groupBy(*keys).agg(*sums)


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    *,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    eff_col: str = "eff_date",
) -> DataFrame:
    """Slowly-changing-dimension type-2 merge (Kimball): fold a batch of
    attribute updates into a versioned dimension, preserving history.

    ``dim`` carries ``key, *attrs, valid_from, valid_to`` (NULL valid_to
    = current row); ``updates`` carries ``key, *attrs, eff_date``.  For a
    key whose current attributes differ from the update: the current row
    is CLOSED (``valid_to = eff_date``) and a new current row opens at
    ``eff_date``.  Same-value updates are no-ops; keys absent from the
    dimension insert as new current rows; closed history rows pass
    through untouched.

    Plan shape: one left join of current rows against the update batch on
    the key (broadcast when the batch is small — left to AQE), then a
    union of three branch projections over that single joined relation.
    History rows never join — they are sliced off by a NULL-check filter
    and concatenated back, so cost is |current| + |batch|, never
    |history|.  This is the MERGE-free expression of the same plan Delta
    Lake executes for SCD2 — portable to any sink that supports
    overwrite.
    """
    changed = None
    for a in attrs:
        ne = ~F.col(a).eqNullSafe(F.col(f"__u_{a}"))
        changed = ne if changed is None else (changed | ne)
    upd = updates.select(
        F.col(key),
        F.col(eff_col).alias("__eff"),
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
    )
    closed_history = dim.filter(F.col(to_col).isNotNull())
    current = dim.filter(F.col(to_col).isNull())
    j = current.join(upd, key, "left")
    matched = F.col("__eff").isNotNull()
    # current rows: untouched (no update or same values) pass through;
    # changed ones close at eff_date.
    kept_or_closed = j.select(
        key,
        *attrs,
        F.col(from_col),
        F.when(matched & changed, F.col("__eff")).otherwise(F.col(to_col)).alias(to_col),
    )
    # changed rows additionally open a new current version.
    opened = (
        j.filter(matched & changed)
        .select(
            key,
            *[F.col(f"__u_{a}").alias(a) for a in attrs],
            F.col("__eff").alias(from_col),
            F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
        )
    )
    # brand-new keys insert as open rows.
    inserted = (
        upd.join(current.select(key), key, "left_anti")
        .select(
            key,
            *[F.col(f"__u_{a}").alias(a) for a in attrs],
            F.col("__eff").alias(from_col),
            F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
        )
    )
    cols = [key, *attrs, from_col, to_col]
    return (
        closed_history.select(*cols)
        .unionByName(kept_or_closed.select(*cols))
        .unionByName(opened.select(*cols))
        .unionByName(inserted.select(*cols))
    )


def incremental_join_delta(
    a_state: DataFrame,
    b_state: DataFrame,
    a_delta: DataFrame,
    b_delta: DataFrame,
    on: list[str],
) -> DataFrame:
    """Delta of an inner-join view under append-only inserts to both
    sides — classic incremental view maintenance algebra (Blakeley,
    Larson & Tompa, SIGMOD 1986 — public):

        Δ(A ⋈ B) = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
                 = ΔA ⋈ (B ∪ ΔB)  ∪  A ⋈ ΔB

    The maintained view needs only the DELTAS joined against states —
    work proportional to |Δ|·selectivity, never a re-join of the full
    tables.  At 100 TB this is the difference between touching a day's
    rows and re-shuffling the year.  AQE broadcasts whichever delta is
    small; appending the result to the stored view completes the
    refresh:  V' = V ∪ Δ(A ⋈ B).

    Columns: both inputs keep their own columns minus the join keys
    (which appear once).  The caller guarantees append-only semantics;
    deletes/updates need the counting algebra (agg_state's signed-count
    variant) — documented, not built.
    """
    b_plus = b_state.unionByName(b_delta)
    part1 = a_delta.join(b_plus, on)
    part2 = a_state.join(b_delta, on)
    return part1.unionByName(part2)


def incremental_join_refresh(
    view: DataFrame,
    a_state: DataFrame,
    b_state: DataFrame,
    a_delta: DataFrame,
    b_delta: DataFrame,
    on: list[str],
) -> DataFrame:
    """``V' = V ∪ Δ(A ⋈ B)`` — the full refreshed view, equal to
    ``(A ∪ ΔA) ⋈ (B ∪ ΔB)`` (the property the oracle asserts) while
    computing only delta-sized joins."""
    return view.unionByName(
        incremental_join_delta(a_state, b_state, a_delta, b_delta, on)
    )


def retract_agg_state(
    state: DataFrame,
    deleted: DataFrame,
    keys: list[str],
    measures: dict[str, str],
) -> DataFrame:
    """Delete propagation into a maintained aggregate — the counting
    algebra: the deleted rows' partial state is NEGATED and folded in
    (``state' = merge(state, −partial(deleted))``), so a deletion batch
    costs |state| + |deleted| instead of recomputing history — the
    GDPR-erasure path for materialized aggregates.  Keys whose count
    reaches zero drop out entirely (they must: a lingering zero row
    differs from the from-scratch recompute the contract equals).
    Decimal sums make retraction exact: add then subtract is the
    identity, in any order, under any partitioning."""
    neg = agg_state(deleted, keys, measures)
    cols = [F.col(c) for c in keys] + [
        (-F.col("n_rows")).alias("n_rows")
    ] + [(-F.col(f"{m}_sum")).alias(f"{m}_sum") for m in measures]
    merged = merge_agg_state(state, neg.select(*cols), keys)
    return merged.filter(F.col("n_rows") != 0)
