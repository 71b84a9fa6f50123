"""Compressed JSONL source: member-gzip splittable scan, single-stream
fallback, codec dispatch."""

import gzip
import json

import pytest

from h2h_spark.sources.jsonl import (
    read_jsonl_gz,
    scan_jsonl_gz_members,
    scan_jsonl_stream,
    write_jsonl_gz_members,
    write_jsonl_gz_stream,
)


def _lines(n=200):
    return [
        json.dumps({"id": i, "text": f"doc {i} " + "x" * (i % 17)},
                   sort_keys=True)
        for i in range(n)
    ]


def _scan_members_all(path, size, split_bytes):
    out = []
    off = 0
    while off < size:
        end = min(off + split_bytes, size)
        out.extend(scan_jsonl_gz_members(path, off, end))
        off = end
    return out


def test_jsonl_gz_member_split_invariance(tmp_work):
    import os

    lines = _lines()
    path = f"{tmp_work}/m.jsonl.gz"
    write_jsonl_gz_members(path, lines, lines_per_member=8)
    size = os.path.getsize(path)
    full = _scan_members_all(path, size, 10**9)
    assert sorted(full) == sorted(lines)
    for sb in [7, 64, 500, size // 2]:
        assert sorted(_scan_members_all(path, size, sb)) == sorted(lines), sb


def test_jsonl_stream_scan(tmp_work):
    lines = _lines(50)
    path = f"{tmp_work}/s.jsonl.gz"
    write_jsonl_gz_stream(path, lines)
    assert list(scan_jsonl_stream(path)) == lines


def test_jsonl_codec_stream(tmp_work):
    import bz2

    lines = _lines(30)
    path = f"{tmp_work}/c.jsonl.bz2"
    with open(path, "wb") as f:
        f.write(bz2.compress("".join(ln + "\n" for ln in lines).encode()))
    assert list(scan_jsonl_stream(path, "bz2")) == lines


def test_jsonl_member_not_line_aligned_raises(tmp_work):
    # a gzip member that cuts a line in half must be refused loudly
    path = f"{tmp_work}/bad.jsonl.gz"
    whole = '{"id": 1, "text": "abcdef"}\n{"id": 2}\n'.encode()
    with open(path, "wb") as f:
        f.write(gzip.compress(whole[:15], mtime=0))
        f.write(gzip.compress(whole[15:], mtime=0))
    with pytest.raises(ValueError, match="line boundary"):
        list(scan_jsonl_gz_members(path, 0, 10**9))


def test_jsonl_gz_datasource_mixed_layouts(spark, tmp_work):
    import os

    lines = _lines(120)
    d = f"{tmp_work}/ds"
    os.makedirs(d)
    write_jsonl_gz_members(f"{d}/part_0.jsonl.gz", lines[:60],
                           lines_per_member=5)
    write_jsonl_gz_stream(f"{d}/part_1.jsonl.gz", lines[60:])
    df = read_jsonl_gz(spark, d, max_partition_bytes=512)
    got = sorted(r["line"] for r in df.collect())
    assert got == sorted(lines)
    assert df.rdd.getNumPartitions() > 2


def test_jsonl_gz_from_json_projection(spark, tmp_work):
    from pyspark.sql import functions as F

    lines = _lines(40)
    path = f"{tmp_work}/p.jsonl.gz"
    write_jsonl_gz_members(path, lines, lines_per_member=4)
    df = read_jsonl_gz(spark, path, max_partition_bytes=512)
    parsed = df.select(
        F.from_json("line", "id bigint, text string").alias("j")
    ).select("j.id", "j.text")
    rows = {r["id"]: r["text"] for r in parsed.collect()}
    assert len(rows) == 40
    assert rows[3] == "doc 3 xxx"


def test_jsonl_gz_empty_dir(spark, tmp_work):
    import os

    d = f"{tmp_work}/empty"
    os.makedirs(d)
    assert read_jsonl_gz(spark, d).count() == 0


def test_jsonl_zst_import_gated(tmp_work):
    # zstandard is not installed in this container: the codec path must
    # fail with a message naming the package, not an AttributeError.
    path = f"{tmp_work}/x.jsonl.zst"
    open(path, "wb").write(b"\x28\xb5\x2f\xfd")
    try:
        import zstandard  # noqa: F401
        pytest.skip("zstandard installed here")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="zstandard"):
        list(scan_jsonl_stream(path, "zst"))
