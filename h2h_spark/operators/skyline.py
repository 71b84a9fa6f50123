"""2D skyline (Pareto frontier) — dominance filtering without a
quadratic self-join.

``p`` dominates ``q`` (minimize ``lo``, maximize ``hi``) iff
``p.lo <= q.lo AND p.hi >= q.hi`` with at least one strict.  The naive
formulation is a NOT EXISTS self-join — quadratic, and Spark plans it
as a BroadcastNestedLoop.  In 2D the frontier has a sweep-line
structure that collapses the problem to a prefix maximum:

- a row survives iff no row with a strictly smaller ``lo`` has
  ``hi >= mine``, and no row with the SAME ``lo`` has ``hi > mine``;
- so group to per-``lo`` maxima (one map-side-combined shuffle whose
  output is |distinct lo| rows), take the running max of ``hi`` over
  the ``lo``-sorted distinct values, and join the two thresholds back.

The only non-distributed step is the window over DISTINCT ``lo``
values — bounded by the attribute's domain (e.g. a price list), not the
table, and orders of magnitude smaller than the data at any scale.  If
the distinct count itself were huge, the standard fix is the same
two-pass range-partitioned prefix-max used for global ranks
(:mod:`h2h_spark.operators.rank`); at TPC-H-like domains the single
sort of the distinct table is the right plan and AQE keeps it one task.

The data table itself is touched by exactly one broadcast-joinable
equi-join — no self-join, no nested loop, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(df: DataFrame, lo_col: str, hi_col: str) -> DataFrame:
    """Rows on the Pareto frontier minimizing ``lo_col`` and maximizing
    ``hi_col``.  Duplicate frontier points (same lo AND hi) all
    survive — neither dominates the other (no strict inequality)."""
    per_lo = df.groupBy(lo_col).agg(F.max(hi_col).alias("__grp_max"))
    w = Window.orderBy(lo_col).rowsBetween(Window.unboundedPreceding, -1)
    thresh = per_lo.select(
        lo_col,
        "__grp_max",
        F.max("__grp_max").over(w).alias("__prev_max"),
    )
    out = df.join(F.broadcast(thresh), lo_col)
    keep = (F.col(hi_col) == F.col("__grp_max")) & (
        F.col("__prev_max").isNull() | (F.col(hi_col) > F.col("__prev_max"))
    )
    return out.where(keep).drop("__grp_max", "__prev_max")
