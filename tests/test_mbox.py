"""mbox source: validated From-line resync, split invariance."""

import os

import pytest

from h2h_spark.sources.mbox import read_mbox, scan_mbox_range, write_mbox


def _msgs(n=80):
    out = []
    for i in range(n):
        body = (b"text %d\nFrom the body trap\nmore\n" % i) * (i % 3 + 1)
        out.append((
            f"u{i}@ex.org Thu Jan  1 00:00:00 2026",
            {"From": f"U{i} <u{i}@ex.org>", "Subject": f"s{i % 5}",
             "Date": "Thu, 01 Jan 2026 00:00:00 +0000"},
            body,
        ))
    return out


def test_mbox_split_invariance(tmp_work):
    p = f"{tmp_work}/a.mbox"
    write_mbox(p, _msgs())
    size = os.path.getsize(p)
    full = list(scan_mbox_range(p, 0, size))
    assert len(full) == 80
    for ncuts in (3, 7, 13):
        cuts = [0] + [size * i // ncuts for i in range(1, ncuts)] + [size]
        got = []
        for a, b in zip(cuts, cuts[1:]):
            got += list(scan_mbox_range(p, a, b))
        assert [g[0] for g in got] == [f[0] for f in full], ncuts


def test_mbox_cut_exactly_at_separator(tmp_work):
    # ownership: a split cut ON the 'F' of a separator gives the message
    # to the right-hand task, once
    p = f"{tmp_work}/b.mbox"
    write_mbox(p, _msgs(10))
    size = os.path.getsize(p)
    offsets = [m[0] for m in scan_mbox_range(p, 0, size)]
    cut = offsets[4]
    left = list(scan_mbox_range(p, 0, cut))
    right = list(scan_mbox_range(p, cut, size))
    assert [m[0] for m in left] == offsets[:4]
    assert [m[0] for m in right] == offsets[4:]
    # and one byte later the message belongs to the LEFT task
    left2 = list(scan_mbox_range(p, 0, cut + 1))
    right2 = list(scan_mbox_range(p, cut + 1, size))
    assert [m[0] for m in left2] == offsets[:5]
    assert [m[0] for m in right2] == offsets[5:]


def test_mbox_header_unfolding_and_fields(tmp_work):
    p = f"{tmp_work}/c.mbox"
    with open(p, "wb") as f:
        f.write(b"From x Thu Jan  1 00:00:00 2026\n")
        f.write(b"Subject: a very\n long subject\n")
        f.write(b"From: A <a@b.c>\n\nbody\n")
    msgs = list(scan_mbox_range(p, 0, os.path.getsize(p)))
    assert msgs[0][2]["subject"] == "a very long subject"
    assert msgs[0][3] == b"body\n"


def test_mbox_datasource(spark, tmp_work):
    d = f"{tmp_work}/ds"
    os.makedirs(d)
    write_mbox(f"{d}/p.mbox", _msgs(60))
    df = read_mbox(spark, d, max_partition_bytes=1024)
    rows = df.collect()
    assert len(rows) == 60
    assert df.rdd.getNumPartitions() > 2
    assert {r["subject"] for r in rows} == {f"s{i}" for i in range(5)}


def test_mbox_not_mbox_raises(spark, tmp_work):
    p = f"{tmp_work}/bad.mbox"
    open(p, "wb").write(b"this is not a mailbox\n")
    with pytest.raises(Exception, match="From"):
        list(scan_mbox_range(p, 0, os.path.getsize(p)))


def test_mbox_empty_dir(spark, tmp_work):
    import os as _os

    d = f"{tmp_work}/empty"
    _os.makedirs(d)
    assert read_mbox(spark, d).count() == 0


def test_mbox_body_from_trap_does_not_split(tmp_work):
    # an UNescaped body line "From x" without a following header line
    # must fail validation and stay inside the message
    p = f"{tmp_work}/trap.mbox"
    with open(p, "wb") as f:
        f.write(b"From a Thu Jan  1 00:00:00 2026\n")
        f.write(b"Subject: one\n\n")
        f.write(b"body line\nFrom the middle of a sentence\nmore body\n")
        f.write(b"From b Thu Jan  1 00:00:00 2026\n")
        f.write(b"Subject: two\n\nbody2\n")
    msgs = list(scan_mbox_range(p, 0, os.path.getsize(p)))
    assert len(msgs) == 2
    assert b"middle of a sentence" in msgs[0][3]


def test_mbox_body_unescape_roundtrip(tmp_work):
    # write -> read is identity on body text (modulo the writer's
    # trailing newline): mboxrd '>From ' quoting is reversed on read
    p = f"{tmp_work}/rt.mbox"
    body = b"plain\nFrom the start of a line\n>From already quoted\n>>From deep"
    write_mbox(p, [(
        "a@b Thu Jan  1 00:00:00 2026", {"From": "a@b"}, body,
    )])
    raw = open(p, "rb").read()
    assert b"\n>From the start" in raw          # quoted on disk
    assert b"\n>>From already quoted" in raw    # one more '>' added
    assert b"\n>>>From deep" in raw
    msgs = list(scan_mbox_range(p, 0, os.path.getsize(p)))
    assert msgs[0][3] == body + b"\n"           # original text back


def test_mbox_crlf_body_found(tmp_work):
    # CRLF-terminated mailbox: the header/body boundary is \r\n\r\n;
    # the body must not be silently lost
    p = f"{tmp_work}/crlf.mbox"
    with open(p, "wb") as f:
        f.write(b"From a Thu Jan  1 00:00:00 2026\r\n")
        f.write(b"Subject: crlf\r\nFrom: A <a@b.c>\r\n\r\n")
        f.write(b"line one\r\nline two\r\n")
    msgs = list(scan_mbox_range(p, 0, os.path.getsize(p)))
    assert len(msgs) == 1
    assert msgs[0][2]["subject"] == "crlf"
    assert msgs[0][3] == b"line one\r\nline two\r\n"


def test_mbox_prose_colon_trap_does_not_split(tmp_work):
    # an unescaped mboxo body line 'From x' followed by a colon-bearing
    # prose line must NOT validate as a separator (no ctime date on the
    # envelope, no second consecutive header line)
    p = f"{tmp_work}/prose.mbox"
    with open(p, "wb") as f:
        f.write(b"From a Thu Jan  1 00:00:00 2026\n")
        f.write(b"Subject: one\n\n")
        f.write(b"From x\nNote: this looks like a header\nbut prose follows\n")
        f.write(b"From b Thu Jan  1 00:00:00 2026\n")
        f.write(b"Subject: two\n\nbody2\n")
    msgs = list(scan_mbox_range(p, 0, os.path.getsize(p)))
    assert len(msgs) == 2
    assert b"Note: this looks like a header" in msgs[0][3]
    assert msgs[1][2]["subject"] == "two"


def test_mbox_odd_envelope_two_headers_validates(tmp_work):
    # fallback path: an envelope WITHOUT a ctime date still validates
    # when two consecutive header lines follow
    p = f"{tmp_work}/odd.mbox"
    with open(p, "wb") as f:
        f.write(b"From MAILER-DAEMON\n")
        f.write(b"Subject: odd\nFrom: d@e.f\n\nbody\n")
        f.write(b"From MAILER-DAEMON\n")
        f.write(b"Subject: odd2\nFrom: d@e.f\n\nbody2\n")
    msgs = list(scan_mbox_range(p, 0, os.path.getsize(p)))
    assert len(msgs) == 2
    assert msgs[1][2]["subject"] == "odd2"


def test_mbox_message_id_columns(spark, tmp_work):
    p = f"{tmp_work}/ids.mbox"
    write_mbox(p, [(
        "a@b Thu Jan  1 00:00:00 2026",
        {"From": "a@b", "Message-ID": "<m1@x>", "In-Reply-To": "<m0@x>"},
        b"hi",
    )])
    r = read_mbox(spark, p).collect()[0]
    assert r["msg_id"] == "<m1@x>" and r["in_reply_to"] == "<m0@x>"
