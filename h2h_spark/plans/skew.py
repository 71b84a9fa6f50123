"""Skew-handling utilities — salting for hot keys.

AQE's skew-join handling (on by default in the session factory) covers
sort-merge joins; salting is the manual tool for the cases AQE can't fix:
hot keys in aggregations with high-cardinality state, and broadcast-
ineligible joins against a skewed build side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated
    ``salt`` ways — spreads a hot key over ``salt`` reducers.

    Use when the right side is too big to broadcast and the left key
    distribution is skewed.  Cost: right side inflates ×salt, so pick the
    smaller relation as ``right``.

    Only left-preserving join types are supported: the right side is
    replicated ``salt`` ways, so 'right'/'full' would emit each unmatched
    right row once per salt value (with null left columns) — wrong results.
    """
    if how not in ("inner", "left", "left_semi", "left_anti", "leftsemi", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "the replicated right side would duplicate unmatched right rows"
        )
    l = left.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")


def two_phase_distinct_count(
    df: DataFrame, group_col: str, distinct_col: str, salt: int = 32
) -> DataFrame:
    """COUNT(DISTINCT x) per group without a single hot reducer: phase 1
    dedups (group, salt-bucketed x) partially, phase 2 merges counts.
    Equivalent result to ``countDistinct`` with bounded per-task state."""
    bucketed = (
        df.filter(F.col(distinct_col).isNotNull())  # COUNT(DISTINCT) ignores nulls
        .select(
            F.col(group_col),
            F.col(distinct_col),
            F.pmod(F.xxhash64(distinct_col), F.lit(salt)).alias("__b"),
        )
        .distinct()
    )
    partial = bucketed.groupBy(group_col, "__b").agg(
        F.count("*").alias("__c")
    )
    return partial.groupBy(group_col).agg(
        F.sum("__c").alias(f"n_distinct_{distinct_col}")
    )
