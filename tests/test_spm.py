"""SentencePiece ModelProto walk: roundtrip, unknown-field skipping,
loud failures, distributed vocab read."""

import pytest

from h2h_spark.operators.spm import (
    encode_spm_model,
    parse_spm_model,
    spm_vocab,
)
from h2h_spark.operators.tfexample import _enc_varint, _ld


def test_roundtrip_and_unknown_fields_skipped():
    m = encode_spm_model([
        ("<unk>", 0.0, "UNKNOWN"),
        ("▁the", -1.5, "NORMAL"),
        ("<0x41>", -12.0, "BYTE"),
        ("[SEP]", 0.0, "USER_DEFINED"),
    ])
    # real models carry TrainerSpec (field 2) / NormalizerSpec (field 3)
    # — unknown here, must be skipped
    m += _ld(2, _ld(1, b"corpus.txt") + _enc_varint(4 << 3)
             + _enc_varint(1))
    m += _ld(3, _ld(1, b"nmt_nfkc"))
    ps = parse_spm_model(m)
    assert [p["piece"] for p in ps] == ["<unk>", "▁the", "<0x41>", "[SEP]"]
    assert [p["type"] for p in ps] == [
        "UNKNOWN", "NORMAL", "BYTE", "USER_DEFINED",
    ]
    assert ps[1]["score"] == -1.5


def test_loud_failures():
    with pytest.raises(ValueError, match="no pieces"):
        parse_spm_model(b"")
    # piece submessage without the piece string
    import struct

    bad = _ld(1, _enc_varint((2 << 3) | 5) + struct.pack("<f", 1.0))
    with pytest.raises(ValueError, match="missing piece"):
        parse_spm_model(bad)
    # unknown type id
    bad = _ld(1, _ld(1, b"x") + _enc_varint(3 << 3) + _enc_varint(9))
    with pytest.raises(ValueError, match="type id"):
        parse_spm_model(bad)
    with pytest.raises(ValueError, match="unknown piece type"):
        encode_spm_model([("x", 0.0, "WEIRD")])


def test_spm_vocab_distributed(spark, tmp_path):
    for s in range(2):
        with open(tmp_path / f"m{s}.model", "wb") as f:
            f.write(encode_spm_model(
                [("<unk>", 0.0, "UNKNOWN")]
                + [(f"▁w{s}_{i}", -float(i), "NORMAL") for i in range(4)]
            ))
    rows = spm_vocab(spark, str(tmp_path)).collect()
    assert len(rows) == 10
    r = next(x for x in rows if x.piece == "▁w1_3")
    assert r.piece_id == 4 and r.score == -3.0 and r.ptype == "NORMAL"
