"""Bucketed (pre-shuffled) tables — the co-located-join tool.

At 100 TB, the single biggest repeated cost is re-shuffling a fact table
on the same join key query after query.  Bucketing pays the shuffle once
at write time: both sides bucketed on the key into the same bucket count
join with NO Exchange in the plan (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int, sort: bool = True
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # The in-memory catalog forgets tables across sessions but their
    # warehouse directories persist; clear a stale location.
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — shuffle-free by construction."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
