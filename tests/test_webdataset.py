"""WebDataset sample assembly: key splitting, contiguity verification,
distributed read."""

import hashlib

import pytest

from h2h_spark.operators.webdataset import (
    iter_wds_samples,
    split_wds_key,
    wds_samples,
    write_wds_shard,
)


def test_split_key_first_dot_rule():
    assert split_wds_key("000017.jpg") == ("000017", "jpg")
    assert split_wds_key("d/000017.seg.json") == ("d/000017", "seg.json")
    assert split_wds_key("a.b/017.cls") == ("a.b/017", "cls")
    assert split_wds_key("noext") == ("noext", "")


def test_samples_and_contiguity_guard(tmp_path):
    p = tmp_path / "s.tar"
    write_wds_shard(str(p), [
        ("00001", {"txt": b"hello", "cls": b"3"}),
        ("00002", {"txt": b"world", "cls": b"7", "json": b"{}"}),
    ])
    got = list(iter_wds_samples(str(p)))
    assert [k for k, _ in got] == ["00001", "00002"]
    assert got[1][1]["json"] == b"{}"
    # non-contiguous key: 00001 reappears after 00002 started
    bad = tmp_path / "bad.tar"
    from h2h_spark.sources.tar import ustar_member_bytes

    with open(bad, "wb") as f:
        f.write(ustar_member_bytes("00001.txt", b"a"))
        f.write(ustar_member_bytes("00002.txt", b"b"))
        f.write(ustar_member_bytes("00001.cls", b"9"))
        f.write(b"\x00" * 1024)
    with pytest.raises(ValueError, match="contiguous"):
        list(iter_wds_samples(str(bad)))
    # duplicate field within one sample
    dup = tmp_path / "dup.tar"
    with open(dup, "wb") as f:
        f.write(ustar_member_bytes("00001.txt", b"a"))
        f.write(ustar_member_bytes("00001.txt", b"b"))
        f.write(b"\x00" * 1024)
    with pytest.raises(ValueError, match="duplicate field"):
        list(iter_wds_samples(str(dup)))


def test_wds_samples_distributed(spark, tmp_path):
    for s in range(3):
        write_wds_shard(str(tmp_path / f"sh_{s}.tar"), [
            (f"{s}_{i}", {"txt": b"t%d" % i, "cls": b"%d" % (i % 4)})
            for i in range(5)
        ])
    df = wds_samples(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 15
    r = next(x for x in rows if x.key == "1_2")
    assert r.n_fields == 2 and sorted(r.exts) == ["cls", "txt"]
    assert r.field_md5["txt"] == hashlib.md5(b"t2").hexdigest()
    assert r.total_bytes == 3
