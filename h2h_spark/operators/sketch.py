"""Count-min sketch — mergeable heavy-hitter counting in fixed state.

At 100 TB an exact per-key frequency table shuffles every distinct key;
a count-min sketch is a depth×width counter grid (KBs), built with ONE
grouping shuffle whose output cardinality is ≤ depth·width regardless of
corpus size, and mergeable by cell-wise addition (the partial-aggregate
contract, so map-side combine collapses each partition first).  Estimates
only ever OVER-count (est ≥ true; over-estimate bounded by N·e/width with
probability 1−e^-depth) — the standard trade for fixed state.

Hashes are the engine-portable md5-based 60-bit hash
(:func:`h2h_spark.operators.dedup.portable_hash60`) with the row index
salted into the input, so the whole sketch — build AND probe — is
bit-reproducible in any engine with md5: the correctness oracle re-derives
the full pipeline in SQL rather than trusting a bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from h2h_spark.operators.dedup import portable_hash60


def _cms_cell(key: Column, row: int, width: int) -> Column:
    """Column index of ``key`` in hash row ``row``."""
    salted = F.concat(F.lit(f"{row}|"), key.cast("string"))
    return F.pmod(portable_hash60(salted), F.lit(width))


def cms_build(df: DataFrame, key_col: str, depth: int = 4, width: int = 256) -> DataFrame:
    """Build the sketch: one pass, one grouping shuffle, ≤ depth·width
    output rows ``(r, c, cnt)``.  Merging two sketches is a union + sum
    on (r, c) — the same shape :mod:`h2h_spark.operators.incremental`
    uses for aggregate states."""
    key = F.col(key_col)
    cells = F.array(*[
        F.struct(
            F.lit(r).alias("r"),
            _cms_cell(key, r, width).alias("c"),
        )
        for r in range(depth)
    ])
    return (
        df.select(F.explode(cells).alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate every key in ``keys``: est = min over rows of the
    key's counter.  The sketch side is ≤ depth·width rows and broadcasts;
    the probe side computes its (r, c) coordinates inline and never
    shuffles more than one aggregate keyed by the probe key."""
    key = F.col(key_col)
    coords = F.array(*[
        F.struct(F.lit(r).alias("r"), _cms_cell(key, r, width).alias("c"))
        for r in range(depth)
    ])
    probes = keys.select(key, F.explode(coords).alias("rc")).select(
        key_col, F.col("rc.r").alias("r"), F.col("rc.c").alias("c")
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "c"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )
