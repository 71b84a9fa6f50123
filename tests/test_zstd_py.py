"""Pure-Python zstd decoder (sources/zstd_py.py): pyarrow round-trips
for the entropy machinery, hand-crafted frames for the dictionary
paths pyarrow cannot produce, format-error loudness, xxh64 vectors."""

import os
import random
import struct

import pyarrow as pa
import pytest

from h2h_spark.sources.zstd_py import (
    ZstdDict,
    ZstdFormatError,
    decompress,
    decompress_frame,
    xxh64,
)


# ---------------------------------------------------------------------------
# reference round-trips (pyarrow's libzstd output is the ground truth)
# ---------------------------------------------------------------------------


def test_pyarrow_roundtrips_all_levels():
    random.seed(7)
    cases = [
        b"",
        b"a",
        b"hello world " * 3,
        b"a" * 100000,                        # RLE blocks
        bytes(range(256)) * 500,
        os.urandom(70000),                    # incompressible -> raw
        b"the quick brown fox jumps over the lazy dog. " * 5000,
        bytes(random.choices(b"abcdef", k=200000)),   # multi-block
        b"".join(bytes([random.randrange(4)]) * random.randrange(1, 50)
                 for _ in range(5000)),
    ]
    for lvl in (1, 3, 9, 19):
        c = pa.Codec("zstd", compression_level=lvl)
        for i, d in enumerate(cases):
            assert decompress(c.compress(d, asbytes=True)) == d, (lvl, i)


def test_pyarrow_roundtrip_structured_text():
    # JSON-ish text: exercises FSE-compressed sequence tables and
    # 4-stream Huffman literals at higher levels
    rows = "".join(
        '{"id": %d, "name": "user_%d", "score": %d}\n' % (i, i * 7, i % 97)
        for i in range(20000)
    ).encode()
    for lvl in (1, 6, 15):
        comp = pa.Codec("zstd", compression_level=lvl).compress(
            rows, asbytes=True
        )
        assert decompress(comp) == rows


# ---------------------------------------------------------------------------
# hand-crafting helpers (test-side ENCODERS for what pyarrow can't emit)
# ---------------------------------------------------------------------------


def _back_bits(fields):
    """Pack (value, nbits) fields so a backward reader sees them in
    order; returns the bitstream bytes incl. the sentinel bit."""
    acc = 0
    total = 0
    for val, n in fields:
        acc = (acc << n) | val
        total += n
    num = (1 << total) | acc
    return num.to_bytes(total // 8 + 1, "little")


def _fwd_bits(fields):
    """Pack (value, nbits) LSB-first (forward streams)."""
    acc = 0
    pos = 0
    for val, n in fields:
        acc |= val << pos
        pos += n
    return acc.to_bytes((pos + 7) // 8 or 1, "little")


def _ncount_desc(counts, accuracy_log):
    """Encode an FSE table description (mirror of the RFC reader)."""
    fields = [(accuracy_log - 5, 4)]
    remaining = 1 << accuracy_log
    i = 0
    while i < len(counts):
        proba = counts[i]
        bits = (remaining + 1).bit_length()
        low_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - (remaining + 1)
        val = proba + 1
        if val < threshold:
            fields.append((val, bits - 1))
        else:
            enc = val if val <= low_mask else val + threshold
            fields.append((enc, bits))
        remaining -= -proba if proba < 0 else proba
        i += 1
        if proba == 0:
            run = 0
            while i < len(counts) and counts[i] == 0 and run < 3:
                run += 1
                i += 1
            fields.append((run, 2))
            # (tests only need runs < 3 followed by a non-zero)
        if remaining <= 0:
            break
    return _fwd_bits(fields)


def _single_symbol_desc(symbol, accuracy_log=5):
    """Description of a table where `symbol` has the FULL probability
    (all states decode it with 0-bit transitions)."""
    counts = [0] * symbol + [1 << accuracy_log]
    return _ncount_desc(counts, accuracy_log)


def _frame(blocks_payload, dict_id=None):
    """Minimal frame header (no single-segment, no checksum) + payload."""
    fhd = 0x01 if dict_id is not None else 0x00
    hdr = struct.pack("<I", 0xFD2FB528) + bytes([fhd, 0x00])
    if dict_id is not None:
        hdr += bytes([dict_id])
    return hdr + blocks_payload


def _compressed_block(content, last=True):
    bh = (len(content) << 3) | (2 << 1) | (1 if last else 0)
    return bh.to_bytes(3, "little") + content


def _raw_lits_header(n):
    assert n < 32
    return bytes([n << 3])


def test_ncount_encoder_matches_reader():
    from h2h_spark.sources.zstd_py import _build_fse_table, _read_fse_counts

    for counts, al in [
        ([32], 5),
        ([0, 0, 32], 5),
        ([10, 22], 5),
        ([1, 1, 30], 5),
        ([-1, 31], 5),
    ]:
        desc = _ncount_desc(counts, al)
        got, got_al, _ = _read_fse_counts(desc, 9, 64)
        assert got_al == al
        assert got[: len(counts)] == counts
        _build_fse_table(got, got_al)  # must be constructible


# ---------------------------------------------------------------------------
# dictionary: raw-content window prefix
# ---------------------------------------------------------------------------


def test_raw_dict_window_prefix_match():
    """A sequence whose match offset reaches back into the DICTIONARY
    content (predefined tables, so only the window is dict-supplied)."""
    from h2h_spark.sources.zstd_py import (
        _LL_DEFAULT_TABLE,
        _ML_DEFAULT_TABLE,
        _OF_DEFAULT_TABLE,
    )

    dict_content = b"0123456789ABCDEF"
    lit = b"XY"
    # desired: ll=2, match_len=8, offset = 10  (reaches 8 into the dict:
    # out = dict + "XY", start = 18 - 10 = 8 -> "89ABCDEF")
    ll_code, ml_code = 2, 5              # ll base 2 / ml base 8, 0 extra
    offset_value = 10 + 3                # 13 -> of_code 3, extra 13-8=5
    of_code, of_extra = 3, 5

    def state_for(table, code):
        for s, (sym, _, _) in enumerate(table):
            if sym == code:
                return s
        raise AssertionError(code)

    (ll_t, ll_al) = _LL_DEFAULT_TABLE
    (of_t, of_al) = _OF_DEFAULT_TABLE
    (ml_t, ml_al) = _ML_DEFAULT_TABLE
    bits = _back_bits([
        (state_for(ll_t, ll_code), ll_al),
        (state_for(of_t, of_code), of_al),
        (state_for(ml_t, ml_code), ml_al),
        (of_extra, of_code),             # of extra, then ml, then ll
    ])
    content = (_raw_lits_header(2) + lit
               + bytes([1])              # 1 sequence
               + bytes([0x00])           # all predefined
               + bits)
    frame = _frame(_compressed_block(content), dict_id=9)
    out = decompress(frame, dict_data=dict_content)
    assert out == b"XY" + b"89ABCDEF"


def test_dict_required_and_id_checked():
    content = _raw_lits_header(1) + b"z" + bytes([0])
    frame = _frame(_compressed_block(content), dict_id=9)
    with pytest.raises(ZstdFormatError, match="dictionary id 9"):
        decompress(frame)
    # structured dict with the WRONG id is loud
    wrong = struct.pack("<II", 0xEC30A437, 8)
    with pytest.raises(ZstdFormatError):
        decompress(frame, dict_data=wrong + b"x")


# ---------------------------------------------------------------------------
# dictionary: structured (entropy tables + repcodes + content)
# ---------------------------------------------------------------------------


def _structured_dict(dict_id, content, repcodes=(7, 11, 13)):
    """Magic + id + Huffman table (bytes 'a'/'b') + OF/ML/LL
    single-symbol FSE tables + repcodes + content."""
    # direct Huffman weights: explicit weights for symbols 0..0x61
    # (0x61='a' weight 1), implicit last symbol 0x62='b' completes
    n_explicit = 0x62
    weights = [0] * n_explicit
    weights[0x61] = 1
    packed = bytearray()
    for i in range(0, n_explicit, 2):
        hi = weights[i] << 4
        lo = weights[i + 1] if i + 1 < n_explicit else 0
        packed.append(hi | lo)
    huf = bytes([127 + n_explicit]) + bytes(packed)
    of = _single_symbol_desc(0)          # of_code 0 -> offset_value 1
    ml = _single_symbol_desc(2)          # ml_code 2 -> match_len 5
    ll = _single_symbol_desc(2)          # ll_code 2 -> lit_len 2
    return (struct.pack("<II", 0xEC30A437, dict_id)
            + huf + of + ml + ll
            + struct.pack("<3I", *repcodes)
            + content)


def test_structured_dict_entropy_tables_and_repcodes():
    """First block of a dict frame uses TREELESS literals (dict Huffman
    table) and REPEAT-mode sequence tables (dict FSE tables); the
    offset comes from the dict's initial repcode 1."""
    zd = _structured_dict(5, b"abcdefghijklmnop")
    # treeless 1-stream literals: rs=2, Huffman stream emitting "ab"
    # (tableLog=1: 'a' -> bit 0, 'b' -> bit 1)
    hstream = _back_bits([(0, 1), (1, 1)])
    cs = len(hstream)
    rs = 2
    lit_hdr = bytes([
        3 | ((rs & 0xF) << 4),                      # type 3, sf 0
        ((rs >> 4) & 0x3F) | ((cs & 0x3) << 6),
        cs >> 2,
    ])
    # sequence bitstream: 3 state inits (5 bits each, state 0), then
    # of_code 0 -> 0 extra bits; ml/ll codes have 0 extra bits
    bits = _back_bits([(0, 5), (0, 5), (0, 5)])
    content = (lit_hdr + hstream
               + bytes([1])              # 1 sequence
               + bytes([0b11_11_11_00])  # LL/OF/ML all repeat mode
               + bits)
    frame = _frame(_compressed_block(content), dict_id=5)
    out = decompress(frame, dict_data=zd)
    # ll=2 ("ab"), offset = rep1 = 7, match_len = 5:
    # window = dict16 + "ab" (18 bytes); start = 18-7 = 11 -> "lmnop"
    assert out == b"ab" + b"lmnop"


def test_structured_dict_parses():
    zd = ZstdDict(_structured_dict(42, b"CONTENT"))
    assert zd.dict_id == 42
    assert zd.content == b"CONTENT"
    assert zd.repcodes == [7, 11, 13]
    assert zd.huf is not None and zd.ll and zd.of and zd.ml
    # raw dict: everything default except the window
    raw = ZstdDict(b"just a prefix")
    assert raw.dict_id is None and raw.content == b"just a prefix"
    assert raw.huf is None and raw.repcodes == [1, 4, 8]


def test_structured_dict_zero_repcode_loud():
    bad = _structured_dict(1, b"c", repcodes=(0, 4, 8))
    with pytest.raises(ZstdFormatError, match="repcode"):
        ZstdDict(bad)


# ---------------------------------------------------------------------------
# format-error loudness
# ---------------------------------------------------------------------------


def test_loud_errors():
    good = pa.Codec("zstd").compress(b"payload bytes here", asbytes=True)
    with pytest.raises(ZstdFormatError, match="magic"):
        decompress_frame(b"\x00\x00\x00\x00" + good[4:])
    with pytest.raises(ZstdFormatError):
        decompress(good[:-3])            # truncated block
    # reserved block type 3
    frame = _frame((3 << 1 | 1 | (1 << 3)).to_bytes(3, "little") + b"x")
    with pytest.raises(ZstdFormatError, match="reserved block type"):
        decompress(frame)
    # declared content size that does not match
    with pytest.raises(ZstdFormatError, match="content size"):
        hdr = struct.pack("<I", 0xFD2FB528) + bytes([0x20, 99])
        bh = (1 << 3) | 1  # raw block, 1 byte, last
        decompress(hdr + bh.to_bytes(3, "little") + b"q")
    with pytest.raises(ZstdFormatError, match="trailing garbage"):
        decompress(good + b"junk")


def test_match_before_window_loud():
    from h2h_spark.sources.zstd_py import (
        _LL_DEFAULT_TABLE,
        _ML_DEFAULT_TABLE,
        _OF_DEFAULT_TABLE,
    )

    def state_for(table, code):
        for s, (sym, _, _) in enumerate(table):
            if sym == code:
                return s
        raise AssertionError(code)

    (ll_t, ll_al) = _LL_DEFAULT_TABLE
    (of_t, of_al) = _OF_DEFAULT_TABLE
    (ml_t, ml_al) = _ML_DEFAULT_TABLE
    # offset 60 with only 2 bytes of window
    offset_value = 63
    of_code, of_extra = 5, 63 - 32
    bits = _back_bits([
        (state_for(ll_t, 2), ll_al),
        (state_for(of_t, of_code), of_al),
        (state_for(ml_t, 5), ml_al),
        (of_extra, of_code),
    ])
    content = (_raw_lits_header(2) + b"XY" + bytes([1, 0x00]) + bits)
    with pytest.raises(ZstdFormatError, match="before the window"):
        decompress(_frame(_compressed_block(content)))


# ---------------------------------------------------------------------------
# xxhash64 (published reference vectors)
# ---------------------------------------------------------------------------


def test_xxh64_vectors():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"", seed=1) == 0xD5AFBA1336A3BE4B
    # >=32-byte input exercises the 4-lane stripe loop
    data = bytes(range(64))
    h = xxh64(data)
    assert isinstance(h, int) and 0 <= h < (1 << 64)
    # self-consistency: python re-impl invariants
    assert xxh64(data) == xxh64(bytes(data))
    assert xxh64(data[:33]) != xxh64(data[:32])


def test_checksum_roundtrip_via_crafted_frame():
    """Frame with Content_Checksum set: one raw block + xxh64 low32."""
    payload = b"checksummed content"
    hdr = struct.pack("<I", 0xFD2FB528) + bytes([0x04, 0x00])
    bh = (len(payload) << 3) | 1
    frame = (hdr + bh.to_bytes(3, "little") + payload
             + struct.pack("<I", xxh64(payload) & 0xFFFFFFFF))
    assert decompress(frame) == payload
    bad = frame[:-1] + bytes([frame[-1] ^ 0xFF])
    with pytest.raises(ZstdFormatError, match="checksum"):
        decompress(bad)
    assert decompress(bad, verify_checksum=False) == payload


def test_skippable_frames_skipped():
    good = pa.Codec("zstd").compress(b"DATA", asbytes=True)
    skip = struct.pack("<II", 0x184D2A5D, 5) + b"dictX"
    assert decompress(skip + good) == b"DATA"


def test_truncation_fuzz_always_loud_or_short():
    """Every truncation of a real frame must raise ZstdFormatError —
    never return wrong bytes silently."""
    comp = pa.Codec("zstd", compression_level=3).compress(
        b"structured " * 400, asbytes=True
    )
    full = decompress(comp)
    for cut in range(1, len(comp)):
        try:
            got = decompress(comp[:cut])
        except ZstdFormatError:
            continue
        raise AssertionError(f"truncation at {cut} returned {len(got)}B "
                             f"instead of raising (full={len(full)}B)")


def test_bitflip_fuzz_never_crashes_uncontrolled():
    """Single-bit corruption anywhere: either a loud ZstdFormatError or
    (rarely) a decode to different bytes that the checksum would catch;
    never an uncontrolled exception type."""
    payload = b"corpus line %d with shared structure\n" * 1
    data = b"".join(payload % i for i in range(300))
    comp = pa.Codec("zstd", compression_level=3).compress(data, asbytes=True)
    random.seed(11)
    for _ in range(300):
        i = random.randrange(4, len(comp))   # keep the magic intact
        bad = bytearray(comp)
        bad[i] ^= 1 << random.randrange(8)
        try:
            decompress(bytes(bad))
        except ZstdFormatError:
            pass
