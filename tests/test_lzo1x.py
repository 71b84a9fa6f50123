"""LZO1X from-spec codec (`sources/lzo1x.py`): hand-built bitstream
vectors for every instruction class (incl. the state-dependent M1
short matches the fixture encoder never emits), encoder round-trips,
and loud error paths.  Vector layouts follow the public format
description (Linux Documentation/lzo.txt)."""

import random

import pytest

from h2h_spark.sources.lzo1x import (
    Lzo1xError,
    lzo1x_compress,
    lzo1x_decompress,
)

EOF = b"\x11\x00\x00"


def test_literal_only_streams():
    # first-byte special: > 17 copies b-17 literals
    assert lzo1x_decompress(bytes([22]) + b"hello" + EOF) == b"hello"
    assert lzo1x_decompress(bytes([18]) + b"x" + EOF) == b"x"
    # regular long-literal run as first instruction: t=2 -> 5 literals
    assert lzo1x_decompress(bytes([2]) + b"abcde" + EOF) == b"abcde"
    # run-length extension: t=0, nz=5 -> 3+15+5 = 23 literals
    data = bytes(range(23))
    assert lzo1x_decompress(bytes([0, 5]) + data + EOF) == data
    # empty stream is just the end marker
    assert lzo1x_decompress(EOF) == b""


def test_m3_match_and_overlap_rle():
    # 'abcd' then copy 4 from distance 4
    v = bytes([21]) + b"abcd" + bytes([32 | 2, 12, 0]) + EOF
    assert lzo1x_decompress(v) == b"abcdabcd"
    # overlapping RLE: 'a' then copy 9 from distance 1
    v = bytes([18]) + b"a" + bytes([32 | 7, 0, 0]) + EOF
    assert lzo1x_decompress(v) == b"a" * 10
    # M3 length extension: L=0 ext nz=3 -> len 2+31+3=36, dist 1
    v = bytes([18]) + b"z" + bytes([32, 3, 0, 0]) + EOF
    assert lzo1x_decompress(v) == b"z" * 37


def test_m2_short_window_match():
    # M2: 1LLDDDSS / 01LDDDSS, dist = (H<<3)+D+1, len = (t>>5)+1
    # after 'abcd', opcode 0b01000000 (t=64): len 3, D=0,H=0 -> wait
    # dist must reach the data: t=0b01_0_011_00 (t=76): L=0 len 3,
    # D=3, S=0, H=0 -> dist = 3+1 = 4
    v = bytes([21]) + b"abcd" + bytes([76, 0]) + EOF
    assert lzo1x_decompress(v) == b"abcdabc"
    # len-8 variant: t = 0b111_011_00 (0xEC): len 8, dist 4
    v = bytes([21]) + b"abcd" + bytes([0xEC, 0]) + EOF
    assert lzo1x_decompress(v) == b"abcd" + b"abcdabcd"


def test_m1_state_dependent_short_matches():
    # trailing-literal state: M3 with S=2 copies 2 literals, then an
    # opcode < 16 is the 2-byte M1 match within 1 kB
    # stream: 'abcd' | M3 len2 dist4 S=2 + 'XY' | M1 t=0 h=1 -> dist 5
    m3 = bytes([32 | 0, 0, 0])  # L=0 -> needs ext... use L=0? no:
    # use t=34 (len 4? no len = (t&31)+2 = 4)... keep len 2: t&31 == 0
    # means extension, so minimum inline M3 length is 3 (t=33).
    v = (bytes([21]) + b"abcd"
         + bytes([33, (0 << 2) | 2 | 12, 0]) + b"XY"  # M3 len3 dist4 S=2
         + bytes([0b0000_0100, 1])                    # M1: 2B, d=(1<<2)+(1)+...
         + EOF)
    # M1 dist = (t>>2) + (h<<2) + 1 = 1 + 4 + 1 = 6
    out = lzo1x_decompress(v)
    # 'abcd' + copy3@4 = 'abc' + 'XY' -> 'abcdabcXY'; M1 copies 2 from
    # dist 6 -> 'da'
    assert out == b"abcdabcXY" + b"da"


def test_m1_long_literal_state_2049_window():
    # after a LONG literal run (state 4), opcode < 16 is the 3-byte
    # match at distance 2049..3072
    lit = bytes(random.Random(5).randbytes(2060))
    run = bytes([0]) + _ext_len(2060 - 18) + lit  # t=0 ext: 3+15+... = 2060
    m1 = bytes([0b0000_0000, 0])  # dist = 0 + 0 + 2049
    out = lzo1x_decompress(run + m1 + EOF)
    assert out == lit + lit[-2049:-2046]


def test_m4_far_match():
    # M4: dist = 16384 + ((t&8)<<11) + (D>>2); build 17000 bytes then
    # copy 5 from dist 16500
    base = bytes(random.Random(9).randbytes(17000))
    run = bytes([0]) + _ext_len(17000 - 18) + base
    d = (16500 - 16384) << 2
    m4 = bytes([16 | 3, d & 0xFF, d >> 8])  # t&7=3 -> len 5
    out = lzo1x_decompress(run + m4 + EOF)
    assert out == base + base[-16500:-16495]


def _ext_len(rem: int) -> bytes:
    outb = bytearray()
    while rem > 255:
        outb.append(0)
        rem -= 255
    outb.append(rem)
    return bytes(outb)


def test_loud_errors():
    with pytest.raises(Lzo1xError, match="empty"):
        lzo1x_decompress(b"")
    with pytest.raises(Lzo1xError, match="truncated|past stream end"):
        lzo1x_decompress(bytes([22]) + b"hel")  # literal run cut short
    with pytest.raises(Lzo1xError, match="truncated|end marker"):
        lzo1x_decompress(bytes([22]) + b"hello")  # missing EOF
    with pytest.raises(Lzo1xError, match="trailing"):
        lzo1x_decompress(EOF + b"junk")
    with pytest.raises(Lzo1xError, match="before output start"):
        # match reaching before the stream: M3 dist 100 after 1 literal
        d = (100 - 1) << 2
        lzo1x_decompress(
            bytes([18]) + b"a" + bytes([33, d & 0xFF, d >> 8]) + EOF
        )


def test_encoder_roundtrips():
    rng = random.Random(1)
    cases = [
        b"", b"a", b"ab", b"abc", b"abcd",
        b"a" * 100_000,
        b"hello world " * 1000,
        rng.randbytes(50_000),
        b"".join(rng.choice([b"foo", b"bar", b"bazzz", b"qux"])
                 for _ in range(20_000)),
        bytes(range(256)) * 300,
    ]
    for c in cases:
        assert lzo1x_decompress(lzo1x_compress(c)) == c


def test_encoder_roundtrip_fuzz():
    rng = random.Random(42)
    for _ in range(60):
        n = rng.randrange(0, 4000)
        # structured-ish data so matches fire at many offsets/lengths
        words = [rng.randbytes(rng.randrange(1, 9))
                 for _ in range(rng.randrange(1, 12))]
        c = b"".join(rng.choice(words) for _ in range(n))[:n]
        assert lzo1x_decompress(lzo1x_compress(c)) == c
