"""Compressed JSONL source: member-gzip splittable scan, single-stream
fallback, codec dispatch."""

import gzip
import json

import pytest

from h2h_spark.sources.jsonl import (
    read_jsonl_gz,
    scan_jsonl_members,
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
        out.extend(scan_jsonl_members(path, off, end))
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
        list(scan_jsonl_members(path, 0, 10**9))


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


# ---------------------------------------------------------------------------
# .jsonl.zst — the Dolma / RedPajama-v2 shard codec (RFC 8878 member
# framing; decoded via zstandard when installed, else pyarrow's bundled
# zstd codec, so the path works in this container)
# ---------------------------------------------------------------------------

from h2h_spark.sources.jsonl import (  # noqa: E402
    write_jsonl_zst_members,
    write_jsonl_zst_stream,
)


def _scan_zst_all(path, size, split_bytes):
    out = []
    off = 0
    while off < size:
        end = min(off + split_bytes, size)
        out.extend(scan_jsonl_members(path, off, end, "zst"))
        off = end
    return out


def test_jsonl_zst_member_split_invariance(tmp_work):
    import os

    lines = _lines()
    path = f"{tmp_work}/m.jsonl.zst"
    write_jsonl_zst_members(path, lines, lines_per_member=8)
    size = os.path.getsize(path)
    assert _scan_zst_all(path, size, 10**9) == lines
    for sb in [7, 64, 500, size // 2]:
        assert _scan_zst_all(path, size, sb) == lines, sb


def test_jsonl_zst_stream_scan(tmp_work):
    lines = _lines(50)
    path = f"{tmp_work}/s.jsonl.zst"
    write_jsonl_zst_stream(path, lines)
    assert list(scan_jsonl_stream(path, "zst")) == lines


def test_jsonl_zst_layout_detection(tmp_work):
    from h2h_spark.sources.gzscan import detect_zst_member_layout

    lines = _lines(60)
    pm = f"{tmp_work}/m.jsonl.zst"
    ps = f"{tmp_work}/s.jsonl.zst"
    write_jsonl_zst_members(pm, lines, lines_per_member=10)
    write_jsonl_zst_stream(ps, lines)
    assert detect_zst_member_layout(pm) == "member"
    assert detect_zst_member_layout(ps) == "stream"


def test_jsonl_zst_skippable_frame_layout(tmp_work):
    # a skippable frame (magic 0x184D2A50, carries no data) at the head
    # must be stepped over by layout detection
    from h2h_spark.sources.gzscan import detect_zst_member_layout
    from h2h_spark.sources.jsonl import _zst_compress

    lines = _lines(40)
    path = f"{tmp_work}/sk.jsonl.zst"
    skip = b"\x50\x2a\x4d\x18" + (8).to_bytes(4, "little") + b"META!!!!"
    with open(path, "wb") as f:
        f.write(skip)
        for lo in range(0, len(lines), 10):
            block = "".join(ln + "\n" for ln in lines[lo:lo + 10])
            f.write(_zst_compress(block.encode()))
    assert detect_zst_member_layout(path) == "member"
    import os

    size = os.path.getsize(path)
    # start=0: the member walk itself steps over the skippable frame
    assert list(scan_jsonl_members(path, 0, size, "zst")) == lines
    # start>0: the aligner scans for the data-frame magic
    assert list(scan_jsonl_members(path, 1, size, "zst")) == lines


def test_jsonl_zst_member_not_line_aligned_raises(tmp_work):
    from h2h_spark.sources.jsonl import _zst_compress

    path = f"{tmp_work}/bad.jsonl.zst"
    whole = '{"id": 1, "text": "abcdef"}\n{"id": 2}\n'.encode()
    with open(path, "wb") as f:
        f.write(_zst_compress(whole[:15]))
        f.write(_zst_compress(whole[15:]))
    with pytest.raises(ValueError, match="line boundary"):
        list(scan_jsonl_members(path, 0, 10**9, "zst"))


def test_jsonl_zst_truncated_frame_raises(tmp_work):
    from h2h_spark.sources.gzscan import ZstFrameError, zst_frame_len
    from h2h_spark.sources.jsonl import _zst_compress

    frame = _zst_compress(b'{"id": 1}\n' * 20)
    path = f"{tmp_work}/t.jsonl.zst"
    open(path, "wb").write(frame[:len(frame) - 5])
    import os

    with open(path, "rb") as f:
        with pytest.raises(ZstFrameError):
            zst_frame_len(f, 0, os.path.getsize(path))


def test_jsonl_zst_frame_len_matches_writer(tmp_work):
    import os

    from h2h_spark.sources.gzscan import zst_frame_len
    from h2h_spark.sources.jsonl import _zst_compress

    blocks = [b'{"id": %d}\n' % i * (i + 1) for i in range(5)]
    frames = [_zst_compress(b) for b in blocks]
    path = f"{tmp_work}/fl.jsonl.zst"
    open(path, "wb").write(b"".join(frames))
    size = os.path.getsize(path)
    pos = 0
    with open(path, "rb") as f:
        for i, fr in enumerate(frames):
            flen, csize = zst_frame_len(f, pos, size)
            assert flen == len(fr), i
            assert csize == len(blocks[i]), i
            pos += flen
    assert pos == size


def test_jsonl_zst_datasource_mixed_layouts(spark, tmp_work):
    import os

    lines = _lines(120)
    d = f"{tmp_work}/dsz"
    os.makedirs(d)
    write_jsonl_zst_members(f"{d}/part_0.jsonl.zst", lines[:60],
                            lines_per_member=5)
    write_jsonl_zst_stream(f"{d}/part_1.jsonl.zst", lines[60:])
    df = read_jsonl_gz(spark, d, max_partition_bytes=512, codec="zst")
    got = sorted(r["line"] for r in df.collect())
    assert got == sorted(lines)
    assert df.rdd.getNumPartitions() > 2


def test_jsonl_unknown_codec_rejected(spark, tmp_work):
    # bz2/xz gained split paths in round 12, so every listed codec now
    # has one; unknown codecs must still fail loudly at plan time
    with pytest.raises(Exception, match="codec"):
        read_jsonl_gz(spark, tmp_work, codec="7z").count()


def test_warc_zst_multi_record_frames_split_invariance(tmp_work):
    import os

    from h2h_spark.sources.warc import (
        _ZstMemberScanner, write_warc_zst_records,
    )

    recs = [
        ({"WARC-Type": "response", "WARC-Record-ID": f"<urn:{i}>"},
         b"pay-%03d|" % i * (i % 4 + 1))
        for i in range(200)
    ]
    p = f"{tmp_work}/a.warc.zst"
    write_warc_zst_records(p, recs, records_per_frame=3)
    size = os.path.getsize(p)
    full = [pl for _, pl in _ZstMemberScanner(p, 0, size).records()]
    assert full == [pl for _, pl in recs]
    got = []
    cuts = list(range(0, size, max(1, size // 7))) + [size]
    for a, b in zip(cuts, cuts[1:]):
        got += [pl for _, pl in _ZstMemberScanner(p, a, b).records()]
    assert got == full


def test_warc_zst_datasource(spark, tmp_work):
    import os

    from h2h_spark.sources.warc import read_warc_zst, write_warc_zst_records

    d = f"{tmp_work}/wz"
    os.makedirs(d)
    recs = [
        ({"WARC-Type": "response", "WARC-Record-ID": f"<urn:{i}>",
          "WARC-Target-URI": f"http://h/{i}"}, b"x" * (i + 1))
        for i in range(50)
    ]
    write_warc_zst_records(f"{d}/p.warc.zst", recs, records_per_frame=2)
    df = read_warc_zst(spark, d, max_partition_bytes=256)
    rows = {r["record_id"]: r["content_length"] for r in df.collect()}
    assert len(rows) == 50
    assert rows["<urn:7>"] == 8


def test_warc_zst_dictionary_frame_rejected(spark, tmp_work):
    import os

    import pytest

    from h2h_spark.sources.warc import read_warc_zst

    d = f"{tmp_work}/wdict"
    os.makedirs(d)
    p = f"{d}/p.warc.zst"
    # skippable frame with the dictionary magic at the head
    open(p, "wb").write(
        b"\x5d\x2a\x4d\x18" + (4).to_bytes(4, "little") + b"DICT"
    )
    with pytest.raises(Exception, match="zstandard"):
        read_warc_zst(spark, d).count()


def test_write_jsonl_shards_roundtrip(spark, tmp_work):
    import os

    from pyspark.sql import functions as F

    from h2h_spark.sources.jsonl import read_jsonl_gz, write_jsonl_shards

    df = spark.range(500).select(
        F.col("id"), (F.col("id") % 7).alias("grp")
    ).repartition(4, "id")
    for codec in ("gz", "zst"):
        d = f"{tmp_work}/shards_{codec}"
        write_jsonl_shards(df, d, codec=codec, lines_per_member=32)
        files = sorted(os.listdir(d))
        assert all(f.startswith("part_") and f.endswith(f".jsonl.{codec}")
                   for f in files)
        back = read_jsonl_gz(spark, d, max_partition_bytes=256, codec=codec)
        parsed = back.select(
            F.from_json("line", "id bigint, grp bigint").alias("j")
        ).select("j.id", "j.grp")
        rows = {r["id"]: r["grp"] for r in parsed.collect()}
        assert len(rows) == 500 and rows[13] == 6
        # member framing => splittable => more tasks than files
        assert back.rdd.getNumPartitions() > len(files)


def test_write_jsonl_shards_line_col(spark, tmp_work):
    from pyspark.sql import functions as F

    from h2h_spark.sources.jsonl import read_jsonl_gz, write_jsonl_shards

    df = spark.range(50).select(
        F.to_json(F.struct(F.col("id"))).alias("doc")
    )
    d = f"{tmp_work}/shards_lc"
    write_jsonl_shards(df, d, codec="zst", lines_per_member=8,
                       line_col="doc")
    back = read_jsonl_gz(spark, d, codec="zst")
    assert back.count() == 50


# --------------------------------------------------------------------------
# zstd seekable format (facebook/zstd contrib/seekable_format)
# --------------------------------------------------------------------------


def test_zst_seek_table_roundtrip(tmp_work):
    import os

    from h2h_spark.sources.gzscan import zst_seek_table
    from h2h_spark.sources.jsonl import write_jsonl_zst_members

    lines = _lines(100)
    p = f"{tmp_work}/seek.jsonl.zst"
    write_jsonl_zst_members(p, lines, lines_per_member=8, seekable=True)
    tbl = zst_seek_table(p)
    assert tbl is not None and len(tbl) == 13  # ceil(100/8)
    # offsets contiguous, extents match the real frame walk
    from h2h_spark.sources.gzscan import zst_frame_len

    size = os.path.getsize(p)
    with open(p, "rb") as f:
        for off, clen, dlen in tbl:
            flen, csize = zst_frame_len(f, off, size)
            assert flen == clen
            assert csize is None or csize == dlen
    # decompressed sizes sum to the plaintext total
    assert sum(d for _, _, d in tbl) == sum(len(ln) + 1 for ln in lines)
    # member scan steps over the trailing seek-table skippable frame
    assert _scan_zst_all(p, size, 10**9) == lines


def test_zst_seek_table_absent_and_corrupt(tmp_work):
    from h2h_spark.sources.gzscan import zst_seek_table
    from h2h_spark.sources.jsonl import write_jsonl_zst_members

    lines = _lines(20)
    p = f"{tmp_work}/plain.jsonl.zst"
    write_jsonl_zst_members(p, lines, lines_per_member=8)
    assert zst_seek_table(p) is None
    # corrupt: footer magic present but frame sizes lie
    ps = f"{tmp_work}/bad.jsonl.zst"
    write_jsonl_zst_members(ps, lines, lines_per_member=8, seekable=True)
    raw = bytearray(open(ps, "rb").read())
    # 3 frames -> 24 entry bytes + 9 footer; the last entry's
    # compressed-size field starts 17 bytes from EOF
    raw[-17] ^= 0x01
    open(ps, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="seek table|length mismatch"):
        zst_seek_table(ps)


def test_jsonl_zst_seekable_datasource_planning(spark, tmp_work):
    import os

    from h2h_spark.sources.jsonl import write_jsonl_zst_members

    d = f"{tmp_work}/seekds"
    os.makedirs(d)
    lines = _lines(200)
    write_jsonl_zst_members(
        f"{d}/p.jsonl.zst", lines, lines_per_member=8, seekable=True
    )
    df = read_jsonl_gz(spark, d, max_partition_bytes=512, codec="zst")
    got = sorted(json.loads(r["line"])["id"] for r in df.collect())
    assert got == list(range(200))
    assert df.rdd.getNumPartitions() > 2  # seek table fanned the file out


def test_write_jsonl_shards_seekable_default(spark, tmp_work):
    import glob
    import os

    from pyspark.sql import functions as F

    from h2h_spark.sources.gzscan import zst_seek_table
    from h2h_spark.sources.jsonl import read_jsonl_gz, write_jsonl_shards

    d = f"{tmp_work}/shards"
    df = spark.range(300).select(
        F.to_json(F.struct(F.col("id"))).alias("line")
    ).repartition(3)
    write_jsonl_shards(df, d, codec="zst", lines_per_member=16,
                       line_col="line")
    shards = glob.glob(f"{d}/*.jsonl.zst")
    assert shards and all(zst_seek_table(p) is not None for p in shards)
    back = read_jsonl_gz(spark, d, codec="zst")
    ids = sorted(json.loads(r["line"])["id"] for r in back.collect())
    assert ids == list(range(300))


def test_fetch_zst_frames_point_lookup_and_guards(spark, tmp_work):
    """Seekable point fetch: exact frames come back; non-seekable
    shards and stale indexes fail loudly."""
    import pytest

    from h2h_spark.sources.jsonl import (
        fetch_zst_frames,
        write_jsonl_zst_members,
    )

    p = f"{tmp_work}/s.jsonl.zst"
    lines = ['{"i": %d}' % i for i in range(50)]
    write_jsonl_zst_members(p, lines, lines_per_member=8, seekable=True)
    locs = spark.createDataFrame(
        [(p, 0), (p, 3), (p, 6)], "file string, frame bigint"
    )
    rows = fetch_zst_frames(spark, locs).collect()
    got = {(r.frame, r.line_no): r.line for r in rows}
    # frame 3 holds lines 24-31; frame 6 holds the 2-line tail
    assert got[(3, 0)] == '{"i": 24}'
    assert got[(6, 1)] == '{"i": 49}'
    assert len([k for k in got if k[0] == 0]) == 8
    assert len([k for k in got if k[0] == 6]) == 2
    # stale index: frame out of range is loud
    bad = spark.createDataFrame([(p, 99)], "file string, frame bigint")
    with pytest.raises(Exception, match="out of range"):
        fetch_zst_frames(spark, bad).collect()
    # non-seekable shard is loud
    p2 = f"{tmp_work}/ns.jsonl.zst"
    write_jsonl_zst_members(p2, lines, lines_per_member=8,
                            seekable=False)
    locs2 = spark.createDataFrame(
        [(p2, 0)], "file string, frame bigint"
    )
    with pytest.raises(Exception, match="seek table"):
        fetch_zst_frames(spark, locs2).collect()
