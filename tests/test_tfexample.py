"""tf.Example protobuf codec: wire-format roundtrip, packed/unpacked
acceptance, unknown-field skipping, DataFrame decode."""

import struct

import pytest

from h2h_spark.operators.tfexample import (
    _enc_varint,
    _ld,
    decode_tf_example,
    encode_tf_example,
    parse_tf_examples,
)


def test_roundtrip_all_kinds():
    ex = {
        "id": 42,
        "tags": [1, -5, 1 << 40],
        "score": [1.5, -2.25],
        "text": b"hello",
        "names": ["a", "b"],
    }
    got = decode_tf_example(encode_tf_example(ex))
    assert got["id"] == [42]
    assert got["tags"] == [1, -5, 1 << 40]
    assert got["score"] == [1.5, -2.25]
    assert got["text"] == [b"hello"]
    assert got["names"] == [b"a", b"b"]


def test_negative_int64_ten_bytes():
    # proto int64 encodes negatives as 10-byte varints
    got = decode_tf_example(encode_tf_example({"v": -1}))
    assert got["v"] == [-1]


def test_unpacked_scalars_accepted():
    # Int64List.value written UNPACKED (one varint field per element):
    # parsers must accept it (protobuf encoding spec).
    body = b"".join(
        _enc_varint((1 << 3) | 0) + _enc_varint(v) for v in (7, 9)
    )
    feature = _ld(3, body)
    entry = _ld(1, b"k") + _ld(2, feature)
    ex = _ld(1, _ld(1, entry))
    assert decode_tf_example(ex)["k"] == [7, 9]


def test_unknown_fields_skipped():
    ex = bytearray(encode_tf_example({"a": 1}))
    # append an unknown fixed64 field (field 9, wire type 1) at top level
    ex += _enc_varint((9 << 3) | 1) + struct.pack("<Q", 123)
    assert decode_tf_example(bytes(ex))["a"] == [1]


def test_truncated_raises():
    ex = encode_tf_example({"a": [1, 2, 3]})
    with pytest.raises(ValueError):
        decode_tf_example(ex[: len(ex) - 2])


def test_parse_tf_examples_dataframe(spark):
    rows = [
        (i, encode_tf_example({
            "id": i,
            "tags": list(range(i % 3 + 1)),
            "score": [float(i) / 2],
            "text": f"doc-{i}",
        }))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["k", "data"])
    out = parse_tf_examples(
        df, "data",
        {"id": "int64", "tags": "int64", "score": "float",
         "text": "string", "missing": "bytes"},
    )
    got = {r["k"]: r for r in out.collect()}
    assert len(got) == 30
    for i in range(30):
        r = got[i]
        assert r["id"] == [i]
        assert r["tags"] == list(range(i % 3 + 1))
        assert r["score"] == [i / 2]
        assert r["text"] == [f"doc-{i}"]
        assert r["missing"] is None


def test_write_tf_examples_roundtrip(spark, tmp_work):
    from h2h_spark.operators.tfexample import parse_tf_examples
    from h2h_spark.sources.tfrecord import read_tfrecord, write_tf_examples

    rows = [(i, f"d{i}", [i, i + 1], float(i) * 0.5) for i in range(25)]
    df = spark.createDataFrame(rows, ["id", "name", "tags", "w"]).repartition(4)
    out_dir = f"{tmp_work}/shards"
    write_tf_examples(df, out_dir)
    back = parse_tf_examples(
        read_tfrecord(spark, out_dir, include_data=True).select("data"),
        "data",
        {"id": "int64", "name": "string", "tags": "int64", "w": "float"},
    )
    got = {r["id"][0]: r for r in back.collect()}
    assert len(got) == 25
    for i, name, tags, w in rows:
        r = got[i]
        assert r["name"] == [name]
        assert r["tags"] == tags
        assert r["w"] == [w]  # .5-steps are float32-exact


# ---------------------------------------------------------------------------
# round 9: wire-format hardening (ADVICE items)
# ---------------------------------------------------------------------------


def test_fields_truncated_fixed_raises_cleanly():
    import pytest

    from h2h_spark.operators.tfexample import _fields

    # fixed32 key (field 1, wt 5) with only 2 trailing bytes
    with pytest.raises(ValueError, match="truncated fixed32"):
        list(_fields(b"\x0d\xaa\xbb"))
    # fixed64 key (field 1, wt 1) with only 3 trailing bytes
    with pytest.raises(ValueError, match="truncated fixed64"):
        list(_fields(b"\x09\xaa\xbb\xcc"))


def test_fields_skips_deprecated_groups():
    from h2h_spark.operators.tfexample import _fields

    # field 1 START_GROUP, nested varint field, END_GROUP, then a normal
    # varint field 2 = 7 — the group content must be skipped as unknown
    buf = b"\x0b" + b"\x10\x05" + b"\x0c" + b"\x10\x07"
    got = list(_fields(buf))
    assert got == [(2, 0, 7)]


def test_fields_unmatched_end_group_raises():
    import pytest

    from h2h_spark.operators.tfexample import _fields

    with pytest.raises(ValueError, match="END_GROUP"):
        list(_fields(b"\x0c"))


def test_parse_tf_examples_name_collision_raises(spark):
    import pytest

    from h2h_spark.operators.tfexample import (
        encode_tf_example, parse_tf_examples,
    )

    df = spark.createDataFrame(
        [(encode_tf_example({"id": [1]}), 9)], "data binary, id bigint"
    )
    with pytest.raises(ValueError, match="collide"):
        parse_tf_examples(df, "data", {"id": "int64"})
