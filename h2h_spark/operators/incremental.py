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
