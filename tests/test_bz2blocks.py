"""Splittable bzip2 (`sources/bz2blocks.py`): bit-aligned block
resync, single-block reframing through the stdlib decoder, windowed
IO, Hadoop line realignment, multi-stream concatenation, and loud
error paths."""

import bz2
import random

import pytest

import h2h_spark.sources.bz2blocks as B
from h2h_spark.sources.bz2blocks import (
    Bz2FormatError,
    bz2_block_lines,
    parse_bz2_blocks,
)

LINES = [f"line {i:06d} " + "abc" * (i % 11) for i in range(30000)]
PAYLOAD = ("\n".join(LINES) + "\n").encode()


def _fixture(tmp_work: str) -> str:
    p = f"{tmp_work}/t.bz2"
    c = bz2.BZ2Compressor(1)  # 100 kB blocks -> real multi-block stream
    open(p, "wb").write(c.compress(PAYLOAD) + c.flush())
    return p


def test_parse_finds_blocks(tmp_work):
    p = _fixture(tmp_work)
    level, starts, ends = parse_bz2_blocks(p)
    assert chr(level) == "1"
    assert len(starts) >= 8 and starts[0] == 32
    assert len(ends) == len(starts) + 1  # one EOS


def test_full_read_matches(tmp_work):
    p = _fixture(tmp_work)
    import os

    full = list(bz2_block_lines(p, 0, os.path.getsize(p)))
    assert [ln.decode() for ln in full] == LINES


def test_split_invariance_random_plans(tmp_work):
    import os

    p = _fixture(tmp_work)
    size = os.path.getsize(p)
    full = list(bz2_block_lines(p, 0, size))
    rng = random.Random(4)
    for _ in range(8):
        k = rng.randrange(2, 8)
        cuts = sorted(rng.sample(range(1, size), k - 1))
        got = []
        for a, b in zip([0] + cuts, cuts + [size]):
            got += list(bz2_block_lines(p, a, b))
        assert got == full


def test_multi_stream_concatenation(tmp_work):
    # pbzip2-style `cat a.bz2 b.bz2`
    p = f"{tmp_work}/cat.bz2"
    blob = (bz2.compress(PAYLOAD[:100_000], 1)
            + bz2.compress(PAYLOAD[100_000:], 1))
    open(p, "wb").write(blob)
    mid = len(blob) // 2
    got = (list(bz2_block_lines(p, 0, mid))
           + list(bz2_block_lines(p, mid, len(blob))))
    assert [ln.decode() for ln in got] == LINES


def test_multistream_mixed_levels(tmp_work):
    """ADVICE r12 (high): `cat a.bz2 b.bz2` with DIFFERENT levels
    (1 + 9).  Reframing with the first stream's level made every
    >100 kB block of the level-9 stream fail decode and be skipped
    silently (10000-line file read back 2000 lines).  Reframing with
    the always-valid maximum level must read every line."""
    import os

    p = f"{tmp_work}/mixed.bz2"
    blob = (bz2.compress(PAYLOAD[:50_000], 1)
            + bz2.compress(PAYLOAD[50_000:], 9))
    open(p, "wb").write(blob)
    got = list(bz2_block_lines(p, 0, os.path.getsize(p)))
    assert [ln.decode() for ln in got] == LINES
    # and split-invariant across the stream boundary
    mid = len(blob) // 2
    got2 = (list(bz2_block_lines(p, 0, mid))
            + list(bz2_block_lines(p, mid, len(blob))))
    assert got2 == got


def test_corrupt_middle_block_is_loud(tmp_work):
    """A corrupt NON-first block is bit-contiguous with the verified
    end of the block before it — guaranteed real, so decode failure
    must raise, not be skipped as a resync false positive."""
    import os

    p = _fixture(tmp_work)
    raw = bytearray(open(p, "rb").read())
    level, starts, _ = parse_bz2_blocks(p)
    assert len(starts) >= 4
    raw[(starts[2] // 8) + 200] ^= 0xFF  # inside the third block
    bad = f"{tmp_work}/badmid.bz2"
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(Bz2FormatError, match="does not decode"):
        list(bz2_block_lines(bad, 0, os.path.getsize(bad)))


def test_corrupt_second_stream_is_loud(tmp_work):
    """First block of a stream whose header follows a verified EOS is
    guaranteed real — corruption there must raise, not truncate."""
    import os

    a = bz2.compress(PAYLOAD[:50_000], 1)
    b = bz2.compress(PAYLOAD[50_000:], 9)
    raw = bytearray(a + b)
    # corrupt inside the second stream's first block (past its
    # 4-byte header + 6-byte magic + 4-byte CRC)
    raw[len(a) + 40] ^= 0xFF
    bad = f"{tmp_work}/badstream.bz2"
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(Bz2FormatError, match="does not decode"):
        list(bz2_block_lines(bad, 0, os.path.getsize(bad)))


def test_window_growth_path(tmp_work, monkeypatch):
    import os

    p = _fixture(tmp_work)
    size = os.path.getsize(p)
    full = list(bz2_block_lines(p, 0, size))
    monkeypatch.setattr(B, "_WINDOW_PAD", 4096)
    got = []
    for a, b in [(0, 5000), (5000, 20000), (20000, size)]:
        got += list(bz2_block_lines(p, a, b))
    assert got == full


def test_corrupt_block_is_loud(tmp_work):
    import os

    p = _fixture(tmp_work)
    raw = bytearray(open(p, "rb").read())
    level, starts, _ = parse_bz2_blocks(p)
    # flip a byte well inside the first block's data
    raw[(starts[0] // 8) + 50] ^= 0xFF
    bad = f"{tmp_work}/bad.bz2"
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(Bz2FormatError, match="does not decode"):
        list(bz2_block_lines(bad, 0, os.path.getsize(bad)))


def test_not_bzip2_is_loud(tmp_work):
    p = f"{tmp_work}/nope.bz2"
    open(p, "wb").write(b"PK\x03\x04 definitely not bzip2")
    with pytest.raises(Bz2FormatError, match="not a bzip2 stream"):
        list(bz2_block_lines(p, 0, 28))


def test_jsonl_bz2_datasource_end_to_end(spark, tmp_work):
    import json
    import os

    from pyspark.sql import functions as F

    from h2h_spark.sources.jsonl import read_jsonl_gz

    src = f"{tmp_work}/shards"
    os.makedirs(src)
    payload = ("\n".join(
        json.dumps({"i": i, "v": i * 3}) for i in range(30000)
    ) + "\n").encode()
    open(f"{src}/part_0.jsonl.bz2", "wb").write(bz2.compress(payload, 1))
    df = read_jsonl_gz(spark, src, max_partition_bytes=8192, codec="bz2")
    assert df.rdd.getNumPartitions() > 1  # byte splits really happen
    j = df.select(F.from_json("line", "i bigint, v bigint").alias("j"))
    row = j.agg(
        F.count(F.lit(1)).alias("n"), F.sum("j.v").alias("s"),
        F.max("j.i").alias("m"),
    ).head()
    assert (row.n, row.s, row.m) == (30000, 3 * sum(range(30000)), 29999)
