"""zstd dictionary frames (IIPC .warc.zst draft): extraction of the
leading skippable dictionary frame, frame-header Dictionary_ID parsing,
id cross-checks, and DECODE.

Since round 11 the decode no longer needs the optional ``zstandard``
package: `sources/zstd_py.py` is a from-spec RFC 8878 decoder with
dictionary support (window prefill + entropy tables + repcodes), so
the dependency-free e2e below always runs; the importorskip e2e keeps
cross-checking against the real library wherever it exists."""

import io
import os

import pytest

from h2h_spark.sources.gzscan import (
    ZST_DICT_FRAME_MAGIC,
    ZstMemberScanner,
    _ZDICT_MAGIC,
    read_zst_dictionary,
    zst_frame_info,
)
from h2h_spark.sources.jsonl import _zst_compress


def _zdict(dict_id: int, payload: bytes = b"entropy+content") -> bytes:
    """A structured-dictionary blob: magic + 4-byte LE id + content."""
    return _ZDICT_MAGIC + dict_id.to_bytes(4, "little") + payload


def _skippable_dict(content: bytes) -> bytes:
    return ZST_DICT_FRAME_MAGIC + len(content).to_bytes(4, "little") + content


def _raw_block_frame(payload: bytes, dict_id: int | None = None) -> bytes:
    """Hand-build a structurally valid zstd frame holding one RAW block
    (RFC 8878 §3.1.1): decodable extent without any decompressor, with
    an optional 1-byte Dictionary_ID declared in the header."""
    fhd = 0x01 if dict_id is not None else 0x00  # did_flag in bits 1-0
    hdr = b"\x28\xb5\x2f\xfd" + bytes([fhd, 0x00])  # magic, FHD, window
    if dict_id is not None:
        hdr += bytes([dict_id])
    bh = (len(payload) << 3) | 1  # raw block (btype 0), last=1
    return hdr + bh.to_bytes(3, "little") + payload


def test_read_zst_dictionary_raw(tmp_work):
    p = f"{tmp_work}/d.zst"
    content = _zdict(7)
    open(p, "wb").write(_skippable_dict(content) + _raw_block_frame(b"x"))
    db, did = read_zst_dictionary(p)
    assert db == content and did == 7


def test_read_zst_dictionary_compressed_content(tmp_work):
    # the dictionary itself may be zstd-compressed inside the skippable
    # frame; that layer inflates with the plain codec
    p = f"{tmp_work}/dc.zst"
    content = _zdict(123456, b"tables" * 100)
    open(p, "wb").write(_skippable_dict(_zst_compress(content)))
    db, did = read_zst_dictionary(p)
    assert db == content and did == 123456


def test_read_zst_dictionary_absent(tmp_work):
    p = f"{tmp_work}/plain.zst"
    open(p, "wb").write(_raw_block_frame(b"hello"))
    assert read_zst_dictionary(p) == (None, None)


def test_read_zst_dictionary_truncated_raises(tmp_work):
    p = f"{tmp_work}/t.zst"
    open(p, "wb").write(
        ZST_DICT_FRAME_MAGIC + (100).to_bytes(4, "little") + b"short"
    )
    with pytest.raises(ValueError, match="truncated"):
        read_zst_dictionary(p)


def test_zst_frame_info_reports_dict_id(tmp_work):
    p = f"{tmp_work}/f.zst"
    frame = _raw_block_frame(b"payload!", dict_id=9)
    open(p, "wb").write(frame)
    with open(p, "rb") as f:
        flen, csize, did = zst_frame_info(f, 0, os.path.getsize(p))
    assert flen == len(frame) and did == 9
    # and a dict-less frame reports 0
    p2 = f"{tmp_work}/f0.zst"
    open(p2, "wb").write(_raw_block_frame(b"payload!"))
    with open(p2, "rb") as f:
        _, _, did0 = zst_frame_info(f, 0, os.path.getsize(p2))
    assert did0 == 0


def _scan_all(path):
    size = os.path.getsize(path)
    sc = ZstMemberScanner(path, 0, size, validate=lambda b: True)
    return list(sc.members())


def test_scanner_dict_frame_without_zstandard_decodes(tmp_work):
    """Round 11: dictionary frames decode WITHOUT the zstandard package
    via the pure-Python RFC 8878 decoder (sources/zstd_py.py).  A
    raw-content dictionary (no structured magic) is a pure window
    prefix; the raw-block frame decodes to its payload."""
    p = f"{tmp_work}/need.zst"
    open(p, "wb").write(
        _skippable_dict(b"raw prefix dictionary")
        + _raw_block_frame(b"x" * 16, dict_id=7)
    )
    got = _scan_all(p)
    assert [plain for _, plain in got] == [b"x" * 16]


def test_scanner_large_dict_frame_resync_pure_python(tmp_work):
    """Regression (round-12 ADVICE): the pure-Python dictionary probe
    needs the COMPLETE frame; validating a >_PROBE_COMPRESSED_CAP
    dictionary member against a capped prefix returned b'' and the
    member was silently DROPPED at split resync.  A mid-file split
    whose alignment scan lands on the big frame must accept it."""
    from h2h_spark.sources.gzscan import _PROBE_COMPRESSED_CAP

    big = b"B" * (_PROBE_COMPRESSED_CAP + 4096)
    parts = [
        _skippable_dict(b"raw prefix dictionary"),
        _raw_block_frame(b"a" * 32, dict_id=7),
        _raw_block_frame(big, dict_id=7),
        _raw_block_frame(b"c" * 32, dict_id=7),
    ]
    p = f"{tmp_work}/bigdict.zst"
    open(p, "wb").write(b"".join(parts))
    size = os.path.getsize(p)
    big_off = len(parts[0]) + len(parts[1])
    # split boundary just before the big frame: split 2's _align must
    # validate (and accept) the >cap dictionary member
    left = list(
        ZstMemberScanner(p, 0, big_off - 1, validate=lambda b: True).members()
    )
    right = list(
        ZstMemberScanner(
            p, big_off - 1, size, validate=lambda b: True
        ).members()
    )
    plains = [pl for _, pl in left] + [pl for _, pl in right]
    assert plains == [b"a" * 32, big, b"c" * 32]


def test_scanner_garbage_structured_dict_is_loud(tmp_work):
    """A dictionary carrying the STRUCTURED magic but unparseable
    entropy tables must fail loud at decode, never yield garbage."""
    try:
        import zstandard  # noqa: F401

        pytest.skip("zstandard installed; its own error path applies")
    except ImportError:
        pass
    p = f"{tmp_work}/badent.zst"
    open(p, "wb").write(
        _skippable_dict(_zdict(7)) + _raw_block_frame(b"x" * 16, dict_id=7)
    )
    with pytest.raises(ValueError, match="Huffman|FSE|truncated"):
        _scan_all(p)


def test_scanner_missing_dictionary_is_loud(tmp_work):
    p = f"{tmp_work}/nodict.zst"
    open(p, "wb").write(_raw_block_frame(b"x" * 16, dict_id=7))
    with pytest.raises(ValueError, match="no leading dictionary"):
        _scan_all(p)


def test_scanner_mismatched_dict_id_is_loud(tmp_work):
    p = f"{tmp_work}/mismatch.zst"
    open(p, "wb").write(
        _skippable_dict(_zdict(9)) + _raw_block_frame(b"x" * 16, dict_id=7)
    )
    with pytest.raises(ValueError, match="declares dictionary id 7.*id 9"):
        _scan_all(p)


def test_warc_zst_dictionary_e2e():
    """Full dictionary roundtrip — runs only where zstandard exists."""
    zstandard = pytest.importorskip("zstandard")
    import tempfile

    from h2h_spark.sources.warc import (
        _ZstMemberScanner,
        write_warc_zst_records,
    )

    recs = [
        (
            {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:{i}>",
                "WARC-Target-URI": f"http://ex.org/{i}",
            },
            (b"common prefix for dict training %d|" % i) * 3,
        )
        for i in range(40)
    ]
    samples = [payload for _, payload in recs]
    dictionary = zstandard.train_dictionary(4096, samples * 4).as_bytes()
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "p.warc.zst")
        write_warc_zst_records(p, recs, dictionary=dictionary)
        size = os.path.getsize(p)
        got = list(_ZstMemberScanner(p, 0, size).records())
        assert len(got) == 40
        assert got[7][1] == recs[7][1]
        # split invariance across the dictionary-compressed frames
        mid = size // 2
        left = list(_ZstMemberScanner(p, 0, mid).records())
        right = list(_ZstMemberScanner(p, mid, size).records())
        assert len(left) + len(right) == 40


def test_warc_zst_dictionary_e2e_pure_python(tmp_work):
    """Full dictionary member scan WITHOUT zstandard: a hand-crafted
    compressed frame whose one sequence match reaches into the
    dictionary window (predefined FSE tables), preceded by the IIPC
    skippable dictionary frame.  Complements the zstandard-gated e2e
    with a dependency-free path that always runs."""
    from h2h_spark.sources.zstd_py import (
        _LL_DEFAULT_TABLE,
        _ML_DEFAULT_TABLE,
        _OF_DEFAULT_TABLE,
    )

    def back_bits(fields):
        acc, total = 0, 0
        for val, n in fields:
            acc = (acc << n) | val
            total += n
        return ((1 << total) | acc).to_bytes(total // 8 + 1, "little")

    def state_for(table, code):
        return next(s for s, (sym, _, _) in enumerate(table) if sym == code)

    dict_content = b"0123456789ABCDEF"
    (ll_t, ll_al), (of_t, of_al), (ml_t, ml_al) = (
        _LL_DEFAULT_TABLE, _OF_DEFAULT_TABLE, _ML_DEFAULT_TABLE
    )
    # literals "XY", then copy 8 bytes from offset 10 (reaches into the
    # dictionary prefix): "89ABCDEF"
    bits = back_bits([
        (state_for(ll_t, 2), ll_al),
        (state_for(of_t, 3), of_al),      # offset_value 13 = 8 + 5
        (state_for(ml_t, 5), ml_al),      # match_len 8
        (5, 3),                           # of extra bits
    ])
    content = bytes([2 << 3]) + b"XY" + bytes([1, 0x00]) + bits
    bh = (len(content) << 3) | (2 << 1) | 1
    # FHD 0x01: 1-byte Dictionary_ID (7) — the scanner threads the
    # skippable dictionary only into frames that declare one
    frame = (b"\x28\xb5\x2f\xfd" + bytes([0x01, 0x00, 7])
             + bh.to_bytes(3, "little") + content)
    p = f"{tmp_work}/dict_e2e.zst"
    open(p, "wb").write(_skippable_dict(dict_content) + frame)
    got = _scan_all(p)
    assert [plain for _, plain in got] == [b"XY" + b"89ABCDEF"]
