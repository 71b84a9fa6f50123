"""Z-order (Morton) clustering for multi-dimensional data skipping.

Parquet files carry per-column min/max statistics; Spark prunes files
and row groups whose stats exclude a filter.  A layout sorted on ONE
column skips well for that column only.  Interleaving the bits of two
(or more) normalized columns into a Morton key and sorting the write on
that key gives every participating column locality, so a selective
conjunctive filter over ANY of them touches a small fraction of files —
the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Everything is JVM bit-arithmetic expressions (shift/and/or composed per
bit — whole-stage-codegen'd); the only driver action is one min/max
aggregate per dimension (2 scalars each) used to normalize values into
the ``bits``-wide integer domain.  At 100 TB the sort is one range
shuffle (Spark's sort-write path) — the write amortizes over every
subsequent pruned read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["morton_key", "zorder_write"]


def morton_key(cols: list[Column], bits: int = 16) -> Column:
    """Bit-interleaved Morton key of pre-normalized non-negative integer
    columns (each must already fit in ``bits`` bits).  With k columns the
    key uses k·bits bits; k·bits must stay ≤ 63."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed 64-bit key")
    key = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        x = c.cast("long")
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), b * n + ci)
            )
    return key


def _normalize(c: Column, lo: float, hi: float, bits: int) -> Column:
    span = max(hi - lo, 1e-300)
    scaled = ((c.cast("double") - F.lit(float(lo))) / F.lit(float(span))) * (
        (1 << bits) - 1
    )
    return F.least(
        F.lit((1 << bits) - 1),
        F.greatest(F.lit(0), F.round(scaled, 0).cast("long")),
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 16,
    n_files: int = 32,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the Morton
    key of ``cols``.  Each dimension is min/max-normalized (one tiny
    aggregate collect — 2 scalars per column) into the ``bits``-wide
    domain before interleaving; ``repartitionByRange`` on the key gives
    contiguous non-overlapping key ranges per file, which is what makes
    the per-file min/max stats selective for every participating column.
    """
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"__lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__hi_{c}") for c in cols],
    ).collect()[0]
    norm = [
        _normalize(F.col(c), stats[f"__lo_{c}"], stats[f"__hi_{c}"], bits)
        for c in cols
    ]
    keyed = df.withColumn("__z", morton_key(norm, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
