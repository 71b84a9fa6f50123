"""Compressed tar (.tar.gz): the splittable member-gzipped layout (one
gzip member per tar member, warc.gz-style framing) and the unsplittable
conventional single-stream layout, plus auto-detection between them."""

import gzip
import hashlib

import pytest

from h2h_spark.sources.tar import (
    detect_tar_gz_layout,
    read_tar_gz,
    scan_tar_gz_members,
    scan_tar_gz_stream,
    ustar_member_bytes,
    write_tar_gz_members,
    write_tar_gz_stream,
)


def _members(n=60):
    return [
        (
            f"d/{i:06d}.bin",
            1_700_000_000 + i,
            (b"C%05d~" % i) * (i % 7 + 1),
        )
        for i in range(n)
    ]


def _expect(members):
    return sorted(
        (name, len(content), mtime, hashlib.md5(content).hexdigest())
        for name, mtime, content in members
    )


def _scan_members_all(path, size, split_bytes):
    out = []
    off = 0
    while off < size:
        end = min(off + split_bytes, size)
        for h, c in scan_tar_gz_members(path, off, end):
            out.append(
                (h["name"], h["size"], h["mtime"],
                 hashlib.md5(c).hexdigest())
            )
        off = end
    return sorted(out)


def test_tar_gz_member_split_invariance(tmp_work):
    import os

    members = _members()
    path = f"{tmp_work}/m.tar.gz"
    write_tar_gz_members(path, members)
    size = os.path.getsize(path)
    full = _scan_members_all(path, size, 10**9)
    assert full == _expect(members)
    for sb in [7, 64, 300, 1024, size // 2]:
        assert _scan_members_all(path, size, sb) == full, sb


def test_tar_gz_stream_scan(tmp_work):
    members = _members(25)
    path = f"{tmp_work}/s.tar.gz"
    write_tar_gz_stream(path, members)
    got = sorted(
        (h["name"], h["size"], h["mtime"], hashlib.md5(c).hexdigest())
        for h, c in scan_tar_gz_stream(path)
    )
    assert got == _expect(members)


def test_tar_gz_stream_reader_handles_member_layout(tmp_work):
    # GzStreamReader restarts on concatenated members, so the serial
    # fallback is correct for BOTH layouts.
    members = _members(25)
    path = f"{tmp_work}/m2.tar.gz"
    write_tar_gz_members(path, members)
    got = sorted(
        (h["name"], h["size"], h["mtime"], hashlib.md5(c).hexdigest())
        for h, c in scan_tar_gz_stream(path)
    )
    assert got == _expect(members)


def test_tar_gz_layout_detection(tmp_work):
    members = _members(10)
    pm = f"{tmp_work}/dm.tar.gz"
    ps = f"{tmp_work}/ds.tar.gz"
    write_tar_gz_members(pm, members)
    write_tar_gz_stream(ps, members)
    assert detect_tar_gz_layout(pm) == "member"
    assert detect_tar_gz_layout(ps) == "stream"


def test_tar_gz_member_spanning_raises(tmp_work):
    # Two gzip members that split a tar member mid-data: the member-mode
    # scanner must refuse (loudly) rather than emit truncated content.
    raw = ustar_member_bytes("a.bin", b"x" * 600, 1)
    path = f"{tmp_work}/span.tar.gz"
    with open(path, "wb") as f:
        f.write(gzip.compress(raw[:700], mtime=0))
        f.write(gzip.compress(raw[700:], mtime=0))
    with pytest.raises(ValueError, match="spans gzip members"):
        list(scan_tar_gz_members(path, 0, 10**9))


def test_tar_gz_truncated_stream_raises(tmp_work):
    members = _members(8)
    path = f"{tmp_work}/trunc.tar.gz"
    write_tar_gz_stream(path, members)
    data = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(data[: len(data) // 2])
    with pytest.raises(ValueError, match="truncated"):
        list(scan_tar_gz_stream(path))


def test_tar_gz_datasource_both_layouts(spark, tmp_work):
    import os

    members = _members(40)
    dm = f"{tmp_work}/dsm"
    os.makedirs(dm)
    write_tar_gz_members(f"{dm}/part_0.tar.gz", members[:20])
    write_tar_gz_stream(f"{dm}/part_1.tar.gz", members[20:])
    df = read_tar_gz(spark, dm, max_partition_bytes=1024)
    got = sorted(
        (r["name"], r["size"], r["mtime"], r["content_md5"])
        for r in df.collect()
    )
    assert got == _expect(members)
    # the member-framed half split into multiple tasks
    assert df.rdd.getNumPartitions() > 2


def _write_tar_codec(path, members, codec):
    import bz2
    import lzma

    raw = b"".join(
        ustar_member_bytes(name, content, mtime)
        for name, mtime, content in members
    ) + b"\x00" * 1024
    comp = bz2.compress(raw) if codec == "bz2" else lzma.compress(raw)
    with open(path, "wb") as f:
        f.write(comp)


@pytest.mark.parametrize("codec", ["bz2", "xz"])
def test_tar_codec_stream_scan(tmp_work, codec):
    from h2h_spark.sources.tar import scan_tar_gz_stream

    members = _members(20)
    path = f"{tmp_work}/c.tar.{codec}"
    _write_tar_codec(path, members, codec)
    got = sorted(
        (h["name"], h["size"], h["mtime"], hashlib.md5(c).hexdigest())
        for h, c in scan_tar_gz_stream(path, codec)
    )
    assert got == _expect(members)


@pytest.mark.parametrize("codec", ["bz2", "xz"])
def test_tar_codec_datasource(spark, tmp_work, codec):
    import os

    members = _members(15)
    d = f"{tmp_work}/ds_{codec}"
    os.makedirs(d)
    _write_tar_codec(f"{d}/part_0.tar.{codec}", members, codec)
    df = read_tar_gz(spark, d, codec=codec)
    got = sorted(
        (r["name"], r["size"], r["mtime"], r["content_md5"])
        for r in df.collect()
    )
    assert got == _expect(members)


def test_tar_codec_member_layout_rejected(spark, tmp_work):
    import os

    d = f"{tmp_work}/bad"
    os.makedirs(d)
    with pytest.raises(Exception, match="member"):
        read_tar_gz(spark, d, codec="bz2", layout="member").collect()


def test_tar_codec_truncated_raises(tmp_work):
    from h2h_spark.sources.tar import scan_tar_gz_stream

    members = _members(10)
    path = f"{tmp_work}/t.tar.bz2"
    _write_tar_codec(path, members, "bz2")
    data = open(path, "rb").read()
    open(path, "wb").write(data[: len(data) // 2])
    with pytest.raises(ValueError, match="truncated|corrupt"):
        list(scan_tar_gz_stream(path, "bz2"))


# ---------------------------------------------------------------------------
# round 9: .tar.zst (member-framed splittable + single-frame cliff)
# ---------------------------------------------------------------------------


def test_tar_zst_member_split_invariance(tmp_work):
    import os

    from h2h_spark.sources.tar import (
        scan_tar_gz_members, write_tar_zst_members,
    )

    members = [(f"d/f{i:03d}.txt", 1000 + i, b"c%03d|" % i * (i % 9 + 1))
               for i in range(120)]
    p = f"{tmp_work}/m.tar.zst"
    write_tar_zst_members(p, members)
    size = os.path.getsize(p)
    full = [(h["name"], c) for h, c in scan_tar_gz_members(p, 0, size, "zst")]
    assert full == [(n, c) for n, _, c in members]
    got = []
    cuts = list(range(0, size, max(1, size // 6))) + [size]
    for a, b in zip(cuts, cuts[1:]):
        got += [(h["name"], c)
                for h, c in scan_tar_gz_members(p, a, b, "zst")]
    assert got == full


def test_tar_zst_stream_scan(tmp_work):
    from h2h_spark.sources.tar import (
        scan_tar_gz_stream, write_tar_zst_stream,
    )

    members = [(f"f{i}.bin", 7, bytes([i]) * (i * 37 % 600)) for i in range(40)]
    p = f"{tmp_work}/s.tar.zst"
    write_tar_zst_stream(p, members)
    got = [(h["name"], c) for h, c in scan_tar_gz_stream(p, "zst")]
    assert got == [(n, c) for n, _, c in members]


def test_tar_zst_datasource_auto_layout(spark, tmp_work):
    import os

    from h2h_spark.sources.tar import (
        read_tar_gz, write_tar_zst_members, write_tar_zst_stream,
    )

    d = f"{tmp_work}/tz"
    os.makedirs(d)
    mem = [(f"a{i}.txt", 1, b"A" * (i + 1)) for i in range(60)]
    stm = [(f"b{i}.txt", 2, b"B" * (i + 1)) for i in range(40)]
    write_tar_zst_members(f"{d}/p0.tar.zst", mem)
    write_tar_zst_stream(f"{d}/p1.tar.zst", stm)
    df = read_tar_gz(spark, d, max_partition_bytes=512, codec="zst")
    names = sorted(r["name"] for r in df.collect())
    assert names == sorted([n for n, _, _ in mem] + [n for n, _, _ in stm])
    assert df.rdd.getNumPartitions() > 2
