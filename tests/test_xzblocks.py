"""xz block-split tier (`sources/xzblocks.py`): container walk from
the footer index, raw-LZMA2 block decode, Hadoop line realignment
across block boundaries, multi-stream concatenation, check
verification, and cross-checks against stdlib ``lzma`` plus (where
the CLI exists) a real ``xz -T`` multi-block file."""

import lzma
import os
import shutil
import struct
import subprocess

import pytest

from h2h_spark.sources.xzblocks import (
    XzFormatError,
    iter_xz_block_bytes,
    parse_xz_blocks,
    write_xz_blocks,
    xz_block_lines,
)

LINES = [f"line-{i:05d} " + "x" * (i % 37) for i in range(5000)]
PAYLOAD = ("\n".join(LINES) + "\n").encode()


def _fixture(tmp_work: str) -> tuple[str, list]:
    n = len(PAYLOAD)
    cuts = [0, 1111, 9777, 30003, 77777, 120001, n - 13, n]
    chunks = [PAYLOAD[a:b] for a, b in zip(cuts, cuts[1:])]
    p = f"{tmp_work}/blocks.xz"
    write_xz_blocks(p, chunks)
    return p, [b - a for a, b in zip(cuts, cuts[1:])]


def test_written_file_decodes_with_stdlib(tmp_work):
    p, _ = _fixture(tmp_work)
    assert lzma.decompress(open(p, "rb").read()) == PAYLOAD


def test_index_parse_and_block_decode(tmp_work):
    p, usizes = _fixture(tmp_work)
    blocks = parse_xz_blocks(p)
    assert [b.usize for b in blocks] == usizes
    assert [b.uoffset for b in blocks] == [
        sum(usizes[:i]) for i in range(len(usizes))
    ]
    with open(p, "rb") as f:
        got = b"".join(
            b"".join(iter_xz_block_bytes(f, blk, p)) for blk in blocks
        )
    assert got == PAYLOAD


def test_line_split_invariance(tmp_work):
    p, _ = _fixture(tmp_work)
    blocks = parse_xz_blocks(p)
    nb = len(blocks)

    def lines_of(splits):
        out = []
        for lo, hi in splits:
            out += list(xz_block_lines(p, lo, hi, blocks))
        return out

    full = lines_of([(0, nb)])
    assert [ln.decode() for ln in full] == LINES
    for plan in (
        [(0, 3), (3, nb)],
        [(0, 1), (1, 2), (2, 5), (5, nb)],
        [(i, i + 1) for i in range(nb)],
    ):
        assert lines_of(plan) == full


def test_multi_stream_concatenation(tmp_work):
    # xz allows `cat a.xz b.xz` with optional 4-null stream padding
    p1, p2 = f"{tmp_work}/s1.xz", f"{tmp_work}/s2.xz"
    write_xz_blocks(p1, [PAYLOAD[:50000], PAYLOAD[50000:90000]])
    write_xz_blocks(p2, [PAYLOAD[90000:]], check="sha256")
    cat = f"{tmp_work}/cat.xz"
    with open(cat, "wb") as f:
        f.write(open(p1, "rb").read())
        f.write(b"\x00" * 8)
        f.write(open(p2, "rb").read())
    bl = parse_xz_blocks(cat)
    assert len(bl) == 3 and bl[2].check_type == 10
    got = list(xz_block_lines(cat, 0, 3, bl))
    assert [ln.decode() for ln in got] == LINES
    split = (list(xz_block_lines(cat, 0, 2, bl))
             + list(xz_block_lines(cat, 2, 3, bl)))
    assert split == got


def test_check_verification_loud(tmp_work):
    p, _ = _fixture(tmp_work)
    blocks = parse_xz_blocks(p)
    raw = bytearray(open(p, "rb").read())
    # corrupt one payload byte of block 2 (past its header)
    raw[blocks[2].offset + 40] ^= 0xFF
    bad = f"{tmp_work}/bad.xz"
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(XzFormatError, match="check .*mismatch|decode"):
        with open(bad, "rb") as f:
            b"".join(iter_xz_block_bytes(f, blocks[2], bad))


def test_container_errors_loud(tmp_work):
    p, _ = _fixture(tmp_work)
    raw = open(p, "rb").read()
    trunc = f"{tmp_work}/trunc.xz"
    open(trunc, "wb").write(raw[:-4])
    with pytest.raises(XzFormatError, match="footer magic"):
        parse_xz_blocks(trunc)
    # footer CRC flips loudly
    bad = bytearray(raw)
    bad[-12] ^= 0xFF
    p2 = f"{tmp_work}/badcrc.xz"
    open(p2, "wb").write(bytes(bad))
    with pytest.raises(XzFormatError, match="footer CRC"):
        parse_xz_blocks(p2)


def test_real_xz_cli_multiblock(tmp_work):
    if shutil.which("xz") is None:
        pytest.skip("xz CLI not installed")
    src = f"{tmp_work}/real.txt"
    with open(src, "w") as f:
        for i in range(60000):
            f.write(f"row {i} {'ab' * (i % 9)}\n")
    subprocess.run(
        ["xz", "-T4", "--block-size=65536", "-k", "-f", src], check=True
    )
    p = src + ".xz"
    bl = parse_xz_blocks(p)
    assert len(bl) > 1, "xz -T should produce a multi-block file"
    got = []
    for i in range(len(bl)):
        got += list(xz_block_lines(p, i, i + 1, bl))
    exp = open(src, "rb").read().split(b"\n")[:-1]
    assert got == exp


def test_jsonl_xz_datasource_end_to_end(spark, tmp_work):
    import json

    from h2h_spark.sources.jsonl import read_jsonl_gz

    src = f"{tmp_work}/shards"
    os.makedirs(src)
    payload = ("\n".join(
        json.dumps({"i": i, "v": i * 3}) for i in range(4000)
    ) + "\n").encode()
    step = 4096
    write_xz_blocks(
        f"{src}/part_0.jsonl.xz",
        [payload[i:i + step] for i in range(0, len(payload), step)],
    )
    df = read_jsonl_gz(spark, src, max_partition_bytes=2048, codec="xz")
    assert df.rdd.getNumPartitions() > 1  # block runs really split
    from pyspark.sql import functions as F

    j = df.select(F.from_json("line", "i bigint, v bigint").alias("j"))
    row = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("j.v").alias("s"),
        F.max("j.i").alias("m"),
    ).head()
    assert (row.n, row.s, row.m) == (4000, 3 * sum(range(4000)), 3999)


def test_fetch_xz_blocks_point_reads(spark, tmp_work):
    import json
    import os

    from h2h_spark.sources.xzblocks import fetch_xz_blocks

    src = f"{tmp_work}/shards"
    os.makedirs(src)
    lines = [json.dumps({"i": i}) for i in range(320)]
    chunks = [("\n".join(lines[i:i + 32]) + "\n").encode()
              for i in range(0, 320, 32)]
    p = f"{src}/s.jsonl.xz"
    write_xz_blocks(p, chunks)
    locs = spark.createDataFrame(
        [(p, 2), (p, 7)], "file string, block int"
    )
    got = fetch_xz_blocks(spark, locs).collect()
    assert len(got) == 64
    ids = sorted(json.loads(r.line)["i"] for r in got)
    assert ids == list(range(64, 96)) + list(range(224, 256))
    assert all(r.line_no == json.loads(r.line)["i"] % 32 for r in got)
    # out-of-range block is loud
    bad = spark.createDataFrame([(p, 99)], "file string, block int")
    with pytest.raises(Exception, match="out of range"):
        fetch_xz_blocks(spark, bad).collect()


def test_writer_check_variants_roundtrip(tmp_work):
    for check in ("none", "crc32", "crc64", "sha256"):
        p = f"{tmp_work}/c_{check}.xz"
        write_xz_blocks(p, [PAYLOAD[:3000], PAYLOAD[3000:7000]],
                        check=check)
        assert lzma.decompress(open(p, "rb").read()) == PAYLOAD[:7000]
        bl = parse_xz_blocks(p)
        with open(p, "rb") as f:
            got = b"".join(
                b"".join(iter_xz_block_bytes(f, b, p)) for b in bl
            )
        assert got == PAYLOAD[:7000]


def test_writer_dict_size_tracks_preset(tmp_work):
    """ADVICE r12: the block header must declare at least the
    dictionary the compressor used.  A preset-9 chunk with a match
    distance beyond preset-6's 8 MiB dict must still round-trip —
    through our reader AND the strict stdlib decoder."""
    import os as _os

    blockA = _os.urandom(6 << 20)
    chunk = blockA + _os.urandom(6 << 20) + blockA + b"tail\n"
    p = f"{tmp_work}/p9.xz"
    write_xz_blocks(p, [chunk], preset=9)
    # header props byte is the 64 MiB dict code (28), not 8 MiB (22)
    raw = open(p, "rb").read()
    at = raw.find(b"\x21\x01")  # LZMA2 filter id + 1-byte props
    assert raw[at + 2] == 28
    assert lzma.decompress(raw) == chunk
    bl = parse_xz_blocks(p)
    with open(p, "rb") as f:
        assert b"".join(iter_xz_block_bytes(f, bl[0], p)) == chunk


def test_bcj_x86_filter_real_cli(tmp_work):
    """VERDICT r12 item 4: a multi-block .xz with the x86 BCJ
    prefilter (the `.tar.xz`-of-binaries shape) must decode through
    the block reader with split invariance."""
    if shutil.which("xz") is None:
        pytest.skip("xz CLI not installed")
    src = f"{tmp_work}/bin.dat"
    # call-opcode-dense payload so the x86 filter actually transforms
    rows = []
    for i in range(30000):
        rows.append(b"fn%05d \xe8" % i + struct.pack(
            "<i", (i * 2654435761) % (1 << 24)) + b" ret")
    with open(src, "wb") as f:
        f.write(b"\n".join(rows) + b"\n")
    subprocess.run(
        ["xz", "--x86", "--lzma2=preset=4", "-T4", "--block-size=65536",
         "-k", "-f", src],
        check=True,
    )
    p = src + ".xz"
    bl = parse_xz_blocks(p)
    assert len(bl) > 1
    with open(p, "rb") as f:
        got = b"".join(
            b"".join(iter_xz_block_bytes(f, blk, p)) for blk in bl
        )
    assert got == open(src, "rb").read()
    # per-block line reads agree with the full read
    full = list(xz_block_lines(p, 0, len(bl), bl))
    split = []
    for i in range(len(bl)):
        split += list(xz_block_lines(p, i, i + 1, bl))
    assert split == full == open(src, "rb").read().split(b"\n")[:-1]


def test_bcj_delta_chain_and_unknown_filter_loud(tmp_work):
    # stdlib-written x86-filtered single-block stream reads fine
    data = (b"\xe8\x12\x34\x56\x00 call-ish " * 4000)
    p = f"{tmp_work}/x86.xz"
    open(p, "wb").write(lzma.compress(
        data,
        filters=[{"id": lzma.FILTER_X86},
                 {"id": lzma.FILTER_LZMA2, "preset": 2}],
    ))
    bl = parse_xz_blocks(p)
    with open(p, "rb") as f:
        assert b"".join(iter_xz_block_bytes(f, bl[0], p)) == data
    # unknown filter ids still raise loudly; known-but-unbuilt BCJ
    # variants (ARM64 id 0x0a on this liblzma) get the clearer message
    from h2h_spark.sources.xzblocks import _parse_block_header
    import zlib as _z

    def forged(fid):
        body = bytes([0x01]) + bytes([fid, 0x00]) + bytes([0x21, 0x01, 22])
        hsize = ((1 + len(body) + 4) + 3) & ~3
        pad = hsize - 4 - 1 - len(body)
        hdr = bytes([hsize // 4 - 1]) + body + b"\x00" * pad
        return hdr + struct.pack("<I", _z.crc32(hdr))

    with pytest.raises(XzFormatError, match="unsupported xz filter"):
        _parse_block_header(forged(0x20), "forged")
    if getattr(lzma, "FILTER_ARM64", None) is None:
        with pytest.raises(XzFormatError, match="ARM64 not supported"):
            _parse_block_header(forged(0x0A), "forged")


def test_writer_bcj_x86_roundtrip(tmp_work):
    """write_xz_blocks(bcj='x86') interops with strict decoders and
    with the block reader (0xE8-dense payload so the filter fires)."""
    payload = ("\n".join(
        f"row {i} 耀耀耀{'好' * (i % 5)}" for i in range(8000)
    ) + "\n").encode()
    chunks = [payload[i:i + 8192] for i in range(0, len(payload), 8192)]
    p = f"{tmp_work}/bcj.xz"
    write_xz_blocks(p, chunks, bcj="x86")
    assert lzma.decompress(open(p, "rb").read()) == payload
    bl = parse_xz_blocks(p)
    assert len(bl) == len(chunks)
    got = []
    for i in range(len(bl)):
        got += list(xz_block_lines(p, i, i + 1, bl))
    assert got == payload.split(b"\n")[:-1]
    if shutil.which("xz"):
        subprocess.run(["xz", "-t", p], check=True)
