"""Column profiling — the ANALYZE/data-audit pass of a curation pipeline.

One aggregate pass over the table computes per-column null counts, exact
distinct counts, and min/max, then a narrow stack() melt emits one row
per column.  Everything is built-in JVM expressions: the wide aggregate
is a single partial-agg + one exchange (COUNT DISTINCT columns each add
an expand, still one shuffle stage under whole-stage codegen); no Python
touches the data.  At 100 TB you would swap approx_count_distinct for
the exact distinct (same shape, sketch-mergeable state) — the exact
variant is kept here because the correctness oracle demands exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile ``cols`` of ``df``: one output row per column with
    ``(column, n_nulls, n_distinct, min_value, max_value)``, min/max
    rendered as strings so heterogeneous column types share a schema."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return one.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_nulls, n_distinct, min_value, max_value)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
