"""Commit-log table state: fold semantics, time travel, gap detection,
zone pruning, loud failures."""

import os

import pytest

from h2h_spark.operators.deltalog import (
    read_log,
    snapshot_files,
    snapshot_scan,
    write_commit,
)


def _table(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    os.makedirs(tbl)
    for i, keys in enumerate(([0, 1], [2, 3], [4, 5])):
        spark.createDataFrame(
            [(k,) for k in keys], "key bigint"
        ).coalesce(1).write.parquet(os.path.join(tbl, f"p{i}"))
    write_commit(tbl, 0, [
        {"add": {"path": f"p{i}", "size": 1, "numRecords": 2,
                 "minKey": i * 2, "maxKey": i * 2 + 1}}
        for i in range(3)
    ])
    write_commit(tbl, 1, [{"remove": {"path": "p1"}}])
    return tbl


def test_fold_and_time_travel(spark, tmp_path):
    tbl = _table(spark, tmp_path)
    live = sorted(r.path for r in snapshot_files(spark, tbl).collect())
    assert live == ["p0", "p2"]
    v0 = sorted(r.path for r in snapshot_files(spark, tbl, 0).collect())
    assert v0 == ["p0", "p1", "p2"]
    keys = sorted(r.key for r in snapshot_scan(spark, tbl).collect())
    assert keys == [0, 1, 4, 5]
    keys0 = sorted(r.key for r in snapshot_scan(spark, tbl, 0).collect())
    assert keys0 == [0, 1, 2, 3, 4, 5]
    # re-add after remove resurrects the path (last action wins)
    write_commit(tbl, 2, [
        {"add": {"path": "p1", "size": 1, "numRecords": 2,
                 "minKey": 2, "maxKey": 3}}
    ])
    assert sorted(
        r.path for r in snapshot_files(spark, tbl).collect()
    ) == ["p0", "p1", "p2"]


def test_zone_pruning_and_empty(spark, tmp_path):
    tbl = _table(spark, tmp_path)
    keys = sorted(
        r.key for r in
        snapshot_scan(spark, tbl, key_between=(4, 9)).collect()
    )
    assert keys == [4, 5]  # only p2 scanned
    with pytest.raises(ValueError, match="no live files"):
        snapshot_scan(spark, tbl, key_between=(100, 200))


def test_loud_failures(spark, tmp_path):
    tbl = _table(spark, tmp_path)
    # version gap
    write_commit(tbl, 5, [{"remove": {"path": "p0"}}])
    with pytest.raises(ValueError, match="gaps"):
        read_log(spark, tbl)
    os.unlink(os.path.join(tbl, "_log", "0000000005.json"))
    # malformed action — the round-13 in-row assertion raises on the
    # first action that touches the parsed rows (no dedicated probe job)
    with open(os.path.join(tbl, "_log", "0000000002.json"), "w") as f:
        f.write('{"neither": {}}\n')
    with pytest.raises(Exception, match="malformed"):
        read_log(spark, tbl).collect()
    # round 14: EVERY projected column carries the assertion — a
    # consumer that reads only size/stats (never op or path) must still
    # raise instead of silently folding over the bad line
    with pytest.raises(Exception, match="malformed"):
        read_log(spark, tbl).select("size").collect()
    with pytest.raises(Exception, match="malformed"):
        read_log(spark, tbl).select("num_records", "min_key").collect()
    os.unlink(os.path.join(tbl, "_log", "0000000002.json"))
    # add/remove in one action is rejected at write time
    with pytest.raises(ValueError, match="exactly one"):
        write_commit(tbl, 2, [
            {"add": {"path": "x"}, "remove": {"path": "y"}}
        ])
    # empty log dir
    with pytest.raises(ValueError, match="commits"):
        read_log(spark, str(tmp_path / "empty"))