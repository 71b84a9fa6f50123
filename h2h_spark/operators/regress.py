"""Distributed ordinary least squares via normal equations (engine
extension — the "fit a line over 100 TB" request every analytics engine
eventually gets).

The whole fit is ONE aggregate: the Gram-matrix sums (Σx, Σx², Σxy, …)
accumulate in exact decimal — order-independent, so any partitioning
gives identical bits — and the closed-form solve (Cramer's rule for the
2-feature + intercept case) is a fixed-order double expression over that
single row.  No iteration, no driver-side data, no randomness: the same
formula written in any engine over the same sums lands on the identical
coefficients, which is how the oracle grades it bit-for-bit.

Supports y ~ β0 + β1·x1 (+ β2·x2).  More features want the distributed
QR/Cholesky route (out of scope here — at d features the Gram aggregate
is d²/2 sums, still one pass, but the solve stops being closed-form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(28,8)"


def _s(col: str) -> F.Column:
    return F.sum(F.col(col).cast(_DEC))


def ols_fit(
    df: DataFrame,
    y: str,
    x1: str,
    x2: str | None = None,
    *,
    round_digits: int = 6,
) -> DataFrame:
    """One-row result: ``(n, b0, b1[, b2])`` — the least-squares fit of
    ``y`` on the features, exact-decimal Gram sums + fixed-order Cramer
    solve.  Raises nothing on singular systems — the division yields
    NULL/Inf, loud in any downstream compare."""
    exprs = [
        F.count(F.lit(1)).cast("double").alias("n"),
        _s(x1).cast("double").alias("sx1"),
        _s(y).cast("double").alias("sy"),
        F.sum((F.col(x1).cast(_DEC) * F.col(x1).cast(_DEC))).cast("double").alias("sx11"),
        F.sum((F.col(x1).cast(_DEC) * F.col(y).cast(_DEC))).cast("double").alias("sx1y"),
    ]
    if x2 is not None:
        exprs += [
            _s(x2).cast("double").alias("sx2"),
            F.sum((F.col(x2).cast(_DEC) * F.col(x2).cast(_DEC))).cast("double").alias("sx22"),
            F.sum((F.col(x1).cast(_DEC) * F.col(x2).cast(_DEC))).cast("double").alias("sx12"),
            F.sum((F.col(x2).cast(_DEC) * F.col(y).cast(_DEC))).cast("double").alias("sx2y"),
        ]
    g = df.agg(*exprs)
    if x2 is None:
        det = "(n * sx11 - sx1 * sx1)"
        b0 = f"(sy * sx11 - sx1 * sx1y) / {det}"
        b1 = f"(n * sx1y - sx1 * sy) / {det}"
        return g.selectExpr(
            "CAST(n AS BIGINT) AS n",
            f"round({b0}, {round_digits}) AS b0",
            f"round({b1}, {round_digits}) AS b1",
        )
    # 3x3 Cramer, every product parenthesized so both engines evaluate
    # the identical IEEE operation sequence.
    det = (
        "(n * ((sx11 * sx22) - (sx12 * sx12))"
        " - sx1 * ((sx1 * sx22) - (sx12 * sx2))"
        " + sx2 * ((sx1 * sx12) - (sx11 * sx2)))"
    )
    d0 = (
        "(sy * ((sx11 * sx22) - (sx12 * sx12))"
        " - sx1 * ((sx1y * sx22) - (sx12 * sx2y))"
        " + sx2 * ((sx1y * sx12) - (sx11 * sx2y)))"
    )
    d1 = (
        "(n * ((sx1y * sx22) - (sx12 * sx2y))"
        " - sy * ((sx1 * sx22) - (sx12 * sx2))"
        " + sx2 * ((sx1 * sx2y) - (sx1y * sx2)))"
    )
    d2 = (
        "(n * ((sx11 * sx2y) - (sx1y * sx12))"
        " - sx1 * ((sx1 * sx2y) - (sx1y * sx2))"
        " + sy * ((sx1 * sx12) - (sx11 * sx2)))"
    )
    return g.selectExpr(
        "CAST(n AS BIGINT) AS n",
        f"round({d0} / {det}, {round_digits}) AS b0",
        f"round({d1} / {det}, {round_digits}) AS b1",
        f"round({d2} / {det}, {round_digits}) AS b2",
    )
