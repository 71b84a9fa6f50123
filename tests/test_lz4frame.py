"""LZ4 frame tier (sources/lz4frame.py): pyarrow round-trips, crafted
linked-block / checksum frames pyarrow can't emit, truncation fuzz,
member-scanner split invariance, and the .jsonl.lz4 datasource path."""

import os
import random
import struct

import pyarrow as pa
import pytest

from h2h_spark.sources.lz4frame import (
    Lz4FrameError,
    Lz4MemberScanner,
    decompress_lz4,
    decompress_lz4f_frame,
    detect_lz4_member_layout,
    lz4f_frame_len,
    parse_lz4f_header,
    xxh32,
)


def test_xxh32_vectors():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"", seed=1) == 0x0B2CB792
    # >=16B exercises the 4-lane stripe loop; stability checks
    d = bytes(range(64))
    assert xxh32(d) == xxh32(bytes(d))
    assert xxh32(d[:17]) != xxh32(d[:16])


def test_pyarrow_roundtrips():
    random.seed(5)
    c = pa.Codec("lz4")
    for i, d in enumerate([
        b"", b"a", b"hello world " * 3, b"a" * 300000,
        os.urandom(70000),
        b"the quick brown fox jumps over the lazy dog. " * 9000,
        bytes(random.choices(b"abcdef", k=250000)),
    ]):
        assert decompress_lz4(c.compress(d, asbytes=True)) == d, i
    # pyarrow's real frames also validate xxh32 indirectly: every
    # header carries the HC byte (xxh32 of the descriptor, byte 1)
    hdr = parse_lz4f_header(c.compress(b"xyz", asbytes=True))
    assert hdr["block_max"] == 65536


def _hdr(flg_extra=0, bd=0x40, content_size=None):
    """Craft a frame header: version 01 + flags; HC computed."""
    flg = 0b0100_0000 | flg_extra
    body = bytes([flg, bd])
    if content_size is not None:
        body += struct.pack("<Q", content_size)
    hc = (xxh32(body) >> 8) & 0xFF
    return struct.pack("<I", 0x184D2204) + body + bytes([hc])


def _block(payload, stored=False):
    word = len(payload) | (0x80000000 if stored else 0)
    return struct.pack("<I", word) + payload


_END = struct.pack("<I", 0)


def _lz4_encode_simple(literals, match_off=0, match_len=0):
    """Tiny LZ4-block encoder: one literal run + optional one match +
    a closing literal-only token (spec: last sequence is literals-only,
    and a block's final literals must be present)."""
    out = bytearray()
    lit = len(literals)
    if match_len:
        assert 4 <= match_len <= 18 and lit < 15
        out.append((lit << 4) | (match_len - 4))
        out += literals
        out += struct.pack("<H", match_off)
        out.append(0x10)  # closing: 1 literal
        out += b"!"
    else:
        assert lit < 15
        out.append(lit << 4)
        out += literals
    return bytes(out)


def test_linked_blocks_window_across_blocks():
    """blockLinked (FLG B.Indep=0, what pyarrow never emits): block 2's
    match reaches into block 1's OUTPUT."""
    b1 = _lz4_encode_simple(b"ABCDEFGH")           # output: ABCDEFGH
    # block 2: 2 literals then copy 8 bytes from offset 10 (reaches 8
    # back into block 1's output) then closing "!"
    b2 = _lz4_encode_simple(b"xy", match_off=10, match_len=8)
    frame = _hdr() + _block(b1) + _block(b2) + _END
    plain, used = decompress_lz4f_frame(frame)
    assert used == len(frame)
    assert plain == b"ABCDEFGH" + b"xy" + b"ABCDEFGH" + b"!"
    # the SAME frame with B.Indep set must fail loud (offset escapes
    # the block's own window)
    frame_indep = _hdr(flg_extra=0b0010_0000) + _block(b1) + _block(b2) + _END
    with pytest.raises(Lz4FrameError, match="offset"):
        decompress_lz4f_frame(frame_indep)


def test_block_and_content_checksums():
    payload = b"checksummed block payload"
    blk = _block(payload, stored=True) + struct.pack("<I", xxh32(payload))
    frame = (_hdr(flg_extra=0b0001_0100)           # B.Checksum + C.Checksum
             + blk + _END + struct.pack("<I", xxh32(payload)))
    plain, used = decompress_lz4f_frame(frame)
    assert plain == payload and used == len(frame)
    bad = bytearray(frame)
    bad[-1] ^= 0xFF                                # flip content checksum
    with pytest.raises(Lz4FrameError, match="content checksum"):
        decompress_lz4f_frame(bytes(bad))
    assert decompress_lz4f_frame(bytes(bad), verify_checksums=False)[0] \
        == payload


def test_content_size_declared_and_checked():
    payload = b"sized payload"
    frame = (_hdr(flg_extra=0b0000_1000, content_size=len(payload))
             + _block(payload, stored=True) + _END)
    assert decompress_lz4f_frame(frame)[0] == payload
    lying = (_hdr(flg_extra=0b0000_1000, content_size=99)
             + _block(payload, stored=True) + _END)
    with pytest.raises(Lz4FrameError, match="content size"):
        decompress_lz4f_frame(lying)


def test_header_checksum_gate():
    frame = _hdr() + _block(b"d", stored=True) + _END
    bad = bytearray(frame)
    bad[6] ^= 0xFF                                 # corrupt HC byte
    with pytest.raises(Lz4FrameError, match="header checksum"):
        decompress_lz4f_frame(bytes(bad))


def test_truncation_fuzz_always_loud():
    comp = pa.Codec("lz4").compress(b"structured " * 400, asbytes=True)
    for cut in range(1, len(comp)):
        with pytest.raises(Lz4FrameError):
            decompress_lz4(comp[:cut])


def test_frame_len_structural_walk(tmp_work):
    c = pa.Codec("lz4")
    f1 = c.compress(b"first frame " * 50, asbytes=True)
    f2 = c.compress(b"second " * 999, asbytes=True)
    p = f"{tmp_work}/two.lz4"
    open(p, "wb").write(f1 + f2)
    with open(p, "rb") as fh:
        ln1, _ = lz4f_frame_len(fh, 0, len(f1) + len(f2))
        ln2, _ = lz4f_frame_len(fh, ln1, len(f1) + len(f2))
    assert ln1 == len(f1) and ln2 == len(f2)
    assert detect_lz4_member_layout(p) == "member"
    p2 = f"{tmp_work}/one.lz4"
    open(p2, "wb").write(f1)
    assert detect_lz4_member_layout(p2) == "stream"


def test_member_scanner_split_invariance(tmp_work):
    c = pa.Codec("lz4")
    frames = [c.compress(b"line %03d|" % i * 20, asbytes=True)
              for i in range(40)]
    p = f"{tmp_work}/members.lz4"
    open(p, "wb").write(b"".join(frames))
    size = os.path.getsize(p)

    def scan(split):
        out = []
        for lo in range(0, size, split):
            sc = Lz4MemberScanner(p, lo, min(lo + split, size))
            out.extend(sc.members())
        return out

    full = scan(10**9)
    assert len(full) == 40
    assert full[7][1] == b"line 007|" * 20
    for split in (13, 100, 555, size // 2, size - 1):
        assert scan(split) == full, split


def test_member_scanner_false_magic_resync(tmp_work):
    """A frame whose PAYLOAD contains the LZ4 magic must not desync
    the scanner: structural validation (HC byte + block walk) rejects
    the false hit."""
    c = pa.Codec("lz4")
    evil = b"ok " * 10 + b"\x04\x22\x4d\x18" + b" more" * 10
    frames = [c.compress(evil, asbytes=True),
              c.compress(b"tail frame", asbytes=True)]
    p = f"{tmp_work}/evil.lz4"
    open(p, "wb").write(b"".join(frames))
    size = os.path.getsize(p)
    # a range starting INSIDE frame 1 must resync to frame 2 exactly
    sc = Lz4MemberScanner(p, 5, size)
    got = list(sc.members())
    assert [plain for _, plain in got] == [b"tail frame"]


def test_jsonl_lz4_datasource(spark, tmp_work):
    from h2h_spark.sources.jsonl import (
        read_jsonl_gz,
        write_jsonl_lz4_members,
    )

    d = f"{tmp_work}/jl4"
    os.makedirs(d)
    lines = ['{"i": %d, "v": "%s"}' % (i, "x" * (i % 17)) for i in range(100)]
    write_jsonl_lz4_members(f"{d}/p.jsonl.lz4", lines, lines_per_member=8)
    df = read_jsonl_gz(spark, d, max_partition_bytes=256, codec="lz4")
    got = sorted(r.line for r in df.collect())
    assert got == sorted(lines)
    # auto layout detects member framing -> many byte-range partitions
    assert df.rdd.getNumPartitions() > 1


def test_jsonl_lz4_stream_layout(spark, tmp_work):
    from h2h_spark.sources.jsonl import read_jsonl_gz

    d = f"{tmp_work}/jl4s"
    os.makedirs(d)
    lines = ['{"i": %d}' % i for i in range(50)]
    blob = "".join(ln + "\n" for ln in lines).encode()
    open(f"{d}/p.jsonl.lz4", "wb").write(
        pa.Codec("lz4").compress(blob, asbytes=True)
    )
    df = read_jsonl_gz(spark, d, codec="lz4")     # auto -> stream
    assert sorted(r.line for r in df.collect()) == sorted(lines)
