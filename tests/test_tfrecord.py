"""TFRecord source: masked-CRC32C framing, header-validated split
realignment with chain check, hard data-CRC verification."""

import struct

import pytest

from h2h_spark.sources.tfrecord import (
    crc32c,
    masked_crc32c,
    plan_tfrecord_splits,
    read_tfrecord,
    scan_tfrecord_range,
    write_tfrecords,
)


def test_crc32c_known_vectors():
    # RFC 3720 B.4 test vectors for CRC-32C
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E
    assert crc32c(b"123456789") == 0xE3069283


def _payloads(n=80):
    return [(b"R%05d|" % i) * (i % 9 + 1) for i in range(n)]


def _scan_all(path, size, split_bytes, verify=True):
    out = []
    off = 0
    while off < size:
        end = min(off + split_bytes, size)
        out.extend(
            (pos, data) for pos, data in
            scan_tfrecord_range(path, off, end, verify)
        )
        off = end
    return out


def test_tfrecord_split_invariance(tmp_work):
    import os

    payloads = _payloads()
    path = f"{tmp_work}/t.tfrecord"
    write_tfrecords(path, payloads)
    size = os.path.getsize(path)
    full = _scan_all(path, size, 10**9)
    assert [d for _, d in full] == payloads
    for sb in [5, 13, 100, 1024, size // 2]:
        assert _scan_all(path, size, sb) == full, sb


def test_tfrecord_resync_survives_fake_header(tmp_work):
    # Embed a VALID 12-byte header (crc-correct length frame) inside a
    # record's payload: the chain check must reject it because the frame
    # it describes doesn't land on another valid header.
    import os

    ln = struct.pack("<Q", 7)
    fake = ln + struct.pack("<I", masked_crc32c(ln)) + b"A" * 7
    payloads = [b"x" * 50, b"pre" + fake + b"post" * 20, b"y" * 60, b"z" * 30]
    path = f"{tmp_work}/fake.tfrecord"
    write_tfrecords(path, payloads)
    size = os.path.getsize(path)
    full = _scan_all(path, size, 10**9)
    # start a split INSIDE record 2's payload, before the fake header
    starts = [pos for pos, _ in full]
    mid = starts[1] + 14
    got = list(scan_tfrecord_range(path, mid, size))
    assert [d for _, d in got] == payloads[2:]


def test_tfrecord_data_crc_detects_corruption(tmp_work):
    payloads = _payloads(5)
    path = f"{tmp_work}/bad.tfrecord"
    write_tfrecords(path, payloads)
    data = bytearray(open(path, "rb").read())
    # flip one payload byte of the first record (header stays valid)
    data[13] ^= 0x40
    open(path, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="CRC"):
        list(scan_tfrecord_range(path, 0, len(data)))
    # checksum-blind mode scans through (framing intact)
    got = list(scan_tfrecord_range(path, 0, len(data), verify_data=False))
    assert len(got) == 5


def test_tfrecord_truncated_raises(tmp_work):
    payloads = _payloads(4)
    path = f"{tmp_work}/tr.tfrecord"
    write_tfrecords(path, payloads)
    data = open(path, "rb").read()
    open(path, "wb").write(data[: len(data) - 3])
    with pytest.raises(ValueError, match="truncated"):
        list(scan_tfrecord_range(path, 0, len(data)))


def test_tfrecord_datasource(spark, tmp_work):
    import hashlib
    import os

    payloads = _payloads(40)
    d = f"{tmp_work}/ds"
    os.makedirs(d)
    write_tfrecords(f"{d}/part_0.tfrecord", payloads[:20])
    write_tfrecords(f"{d}/part_1.tfrecord", payloads[20:])
    df = read_tfrecord(spark, d, max_partition_bytes=256)
    rows = df.collect()
    assert len(rows) == 40
    assert sorted(r["data_md5"] for r in rows) == sorted(
        hashlib.md5(p).hexdigest() for p in payloads
    )
    assert df.rdd.getNumPartitions() > 2
    with_data = read_tfrecord(spark, d, include_data=True)
    got = sorted(bytes(r["data"]) for r in with_data.collect())
    assert got == sorted(payloads)


def test_tfrecord_empty_dir(spark, tmp_work):
    import os

    d = f"{tmp_work}/empty"
    os.makedirs(d)
    assert read_tfrecord(spark, d).count() == 0


def test_tfrecord_empty_file_skipped(spark, tmp_work):
    import os

    d = f"{tmp_work}/one"
    os.makedirs(d)
    open(f"{d}/part_0.tfrecord", "wb").close()
    write_tfrecords(f"{d}/part_1.tfrecord", [b"abc"])
    df = read_tfrecord(spark, d)
    assert df.count() == 1


# ---------------------------------------------------------------------------
# round 9: vectorized CRC-32C + gzip-compressed shards
# ---------------------------------------------------------------------------


def test_crc32c_vectorized_matches_scalar():
    import random

    from h2h_spark.sources.tfrecord import _crc_update, crc32c

    random.seed(42)
    for sz in [0, 1, 1023, 1024, 1025, 4095, 4096, 4097, 8192, 100_000]:
        d = random.randbytes(sz)
        assert crc32c(d) == (~_crc_update(0xFFFFFFFF, d) & 0xFFFFFFFF), sz
    # incremental state threading across the crossover
    d = random.randbytes(10_000)
    assert crc32c(d[5000:], crc32c(d[:5000])) == crc32c(d)


def test_tfrecord_gz_roundtrip(tmp_work):
    from h2h_spark.sources.tfrecord import scan_tfrecord_gz, write_tfrecords_gz

    payloads = [b"rec-%04d|" % i * (i % 5 + 1) for i in range(300)]
    path = f"{tmp_work}/a.tfrecord.gz"
    write_tfrecords_gz(path, payloads)
    got = [d for _, d in scan_tfrecord_gz(path)]
    assert got == payloads
    # offsets are decompressed-stream positions, strictly increasing
    offs = [p for p, _ in scan_tfrecord_gz(path)]
    assert offs == sorted(offs) and offs[0] == 0


def test_tfrecord_gz_data_crc_detects_corruption(tmp_work):
    import gzip
    import io

    from h2h_spark.sources.tfrecord import (
        masked_crc32c, scan_tfrecord_gz,
    )

    data = b"X" * 40
    ln = struct.pack("<Q", len(data))
    frame = (
        ln + struct.pack("<I", masked_crc32c(ln))
        + data + struct.pack("<I", masked_crc32c(data) ^ 1)
    )
    path = f"{tmp_work}/bad.tfrecord.gz"
    open(path, "wb").write(gzip.compress(frame, mtime=0))
    with pytest.raises(ValueError, match="CRC mismatch"):
        list(scan_tfrecord_gz(path))
    # checksum-blind opt-out still reads it
    assert [d for _, d in scan_tfrecord_gz(path, verify_data=False)] == [data]


def test_tfrecord_gz_truncated_raises(tmp_work):
    import gzip

    from h2h_spark.sources.tfrecord import (
        masked_crc32c, scan_tfrecord_gz,
    )

    data = b"Y" * 64
    ln = struct.pack("<Q", len(data))
    frame = ln + struct.pack("<I", masked_crc32c(ln)) + data[:10]
    path = f"{tmp_work}/trunc.tfrecord.gz"
    open(path, "wb").write(gzip.compress(frame, mtime=0))
    with pytest.raises(ValueError, match="truncated"):
        list(scan_tfrecord_gz(path))


def test_tfrecord_datasource_mixed_plain_and_gz(spark, tmp_work):
    import os

    from h2h_spark.sources.tfrecord import (
        read_tfrecord, write_tfrecords, write_tfrecords_gz,
    )

    d = f"{tmp_work}/mix"
    os.makedirs(d)
    pay_a = [b"plain-%03d" % i for i in range(200)]
    pay_b = [b"gzzzz-%03d" % i for i in range(150)]
    write_tfrecords(f"{d}/part_0.tfrecord", pay_a)
    write_tfrecords_gz(f"{d}/part_1.tfrecord.gz", pay_b)
    df = read_tfrecord(spark, d, max_partition_bytes=512, include_data=True)
    got = sorted(bytes(r["data"]) for r in df.collect())
    assert got == sorted(pay_a + pay_b)
    # plain file split into many tasks + 1 whole-file gz task
    assert df.rdd.getNumPartitions() > 2


def test_tfrecord_single_file_path_not_double_planned(spark, tmp_work):
    # a single plain .tfrecord passed as the path must not ALSO be
    # planned as a gz whole-file task (list_part_files returns a file
    # path as-is for any pattern)
    from h2h_spark.sources.tfrecord import read_tfrecord, write_tfrecords

    p = f"{tmp_work}/one.tfrecord"
    payloads = [b"r%03d" % i for i in range(50)]
    write_tfrecords(p, payloads)
    df = read_tfrecord(spark, p, include_data=True)
    assert df.count() == 50
    # and a single .tfrecord.gz path reads only as gz
    from h2h_spark.sources.tfrecord import write_tfrecords_gz

    pg = f"{tmp_work}/one.tfrecord.gz"
    write_tfrecords_gz(pg, payloads)
    assert read_tfrecord(spark, pg).count() == 50
