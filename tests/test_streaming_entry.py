"""Streaming helpers + driver-contract consistency."""
import __spark_entry__ as entrymod
from h2h_spark.streaming import sessionize

from tests.conftest import SF_DIR


def test_sessionize(spark):
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),
        (1, "2024-01-01 02:00:00"),  # gap > 30 min → new session
        (2, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) AS ts"
    )
    out = sessionize(df, "user_id", "ts", gap_seconds=1800).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r.session_id)
    assert sorted(by_user[1]) == [1, 1, 2]
    assert by_user[2] == [1]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_contract_consistency():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle is non-trivial SQL
    for name, sql in oracles.items():
        assert "SELECT" in sql.upper(), name
    # rows-only queries are the documented engine-specific ones
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"q_dedup_near_minhash", "q_simhash_pairs", "q_ann_topk"}


def test_queries_run_at_sf0001(spark):
    """Every declared query must at least execute at the smoke SF."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
