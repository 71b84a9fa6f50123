"""Round-8 fixes: RFC 9309 wildcard rules in the robots filter, the
fragment-embedded ``?`` edge in URL canonicalization, and the
empty-bloom-index guard."""

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------ robots wildcards


def _verdicts(spark, rules, paths, host="h"):
    from h2h_spark.operators.robots import robots_filter

    urls = spark.createDataFrame(
        [(i, host, p) for i, p in enumerate(paths)], ["id", "host", "path"]
    )
    rdf = spark.createDataFrame(
        [(host, pat, allow) for pat, allow in rules],
        ["host", "pattern", "allow"],
    )
    out = robots_filter(urls, rdf, id_col="id").collect()
    return {r["path"]: (r["allowed"], r["rule"]) for r in out}

def test_robots_star_and_dollar(spark):
    # RFC 9309 §2.2.3: * matches any char sequence, terminal $ anchors.
    v = _verdicts(
        spark,
        rules=[("/*.pdf$", False)],
        paths=["/a/b.pdf", "/x.pdf", "/a/b.pdfx", "/a/pdf", "/p.pdf/sub"],
    )
    assert v["/a/b.pdf"] == (False, "/*.pdf$")
    assert v["/x.pdf"] == (False, "/*.pdf$")
    assert v["/a/b.pdfx"][0] is True  # $ anchored: .pdfx does not match
    assert v["/a/pdf"][0] is True
    assert v["/p.pdf/sub"][0] is True


def test_robots_star_unanchored_prefix(spark):
    # Without $, the pattern matches a PREFIX of the path.
    v = _verdicts(
        spark,
        rules=[("/dl/*/raw", False)],
        paths=["/dl/a/raw", "/dl/a/b/raw/more", "/dl/raw"],
    )
    assert v["/dl/a/raw"][0] is False
    assert v["/dl/a/b/raw/more"][0] is False  # * spans a/b; prefix match
    assert v["/dl/raw"][0] is True  # * must consume at least the slash? no —
    # "/dl/*/raw" with * matching "" gives "/dl//raw" ≠ "/dl/raw"


def test_robots_wildcard_specificity_and_literals(spark):
    # Longest pattern (most octets) wins across wildcard + plain rules;
    # regex metachars in patterns stay literal.
    v = _verdicts(
        spark,
        rules=[("/p", True), ("/*.php", False)],
        paths=["/p/index.php", "/p/page"],
    )
    assert v["/p/index.php"] == (False, "/*.php")  # 6 octets > 2
    assert v["/p/page"] == (True, "/p")
    v2 = _verdicts(spark, rules=[("/a+b", False)], paths=["/a+b/x", "/aab"])
    assert v2["/a+b/x"][0] is False  # literal '+', not regex repeat
    assert v2["/aab"][0] is True


def test_robots_mid_dollar_literal(spark):
    # $ is only special when terminal; mid-pattern it is a literal.
    v = _verdicts(
        spark, rules=[("/x$y", False)], paths=["/x$y/z", "/xy"]
    )
    assert v["/x$y/z"][0] is False
    assert v["/xy"][0] is True


# ------------------------------------------------------ urlnorm fragment


def test_url_fragment_question_mark_not_query(spark):
    from h2h_spark.operators.urlnorm import canonicalize_url

    cases = [
        # a ? inside the fragment is fragment text, not a query
        ("https://Ex.org/p#frag?utm_source=x", "https://ex.org/p"),
        ("https://ex.org/p?b=2&a=1#frag?z=9", "https://ex.org/p?a=1&b=2"),
        ("https://ex.org/p#?", "https://ex.org/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [
        r.c for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [want for _, want in cases]


# ------------------------------------------------------ bloomidx guard


def test_bloom_empty_index_raises(spark):
    from h2h_spark.operators.bloomidx import read_point_lookup

    empty_index = spark.createDataFrame(
        [], "file string, m_bits int, bloom binary"
    )
    with pytest.raises(ValueError, match="empty"):
        read_point_lookup(spark, empty_index, "k", [1])


# ---------------------------------------------- CDC short-doc regression


def test_cdc_short_docs_tile_bytes(spark):
    # Docs shorter than the 32-byte gear window crashed on a numpy
    # shape mismatch (t[:n-k] with k >= n); they must chunk cleanly and
    # tile the byte stream.
    from h2h_spark.operators.dedup import content_defined_chunks

    rows = [(1, "a"), (2, "ab"), (3, "D7 w01 w08 next"), (4, "x" * 31),
            (5, "y" * 32), (6, "z" * 200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = content_defined_chunks(df, "doc_id", "text", mask_bits=5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2, 3, 4, 5, 6}
    for doc_id, text in rows:
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        assert chunks[0]["start"] == 1
        pos = 1
        for c in chunks:
            assert c["start"] == pos
            pos += c["chunk_len"]
        assert pos - 1 == len(text.encode())


# ---------------------------------------------- WARC payload column


def test_warc_include_payload(spark, tmp_work):
    from h2h_spark.sources.warc import read_warc, write_warc_records

    path = f"{tmp_work}/p.warc"
    recs = [(
        {"WARC-Type": "response", "WARC-Record-ID": f"<urn:p:{i}>"},
        b"BODY-%03d" % i,
    ) for i in range(10)]
    write_warc_records(path, recs)
    with_p = read_warc(spark, path, include_payload=True)
    assert "payload" in with_p.columns
    got = {r["record_id"]: bytes(r["payload"]) for r in with_p.collect()}
    assert got == {f"<urn:p:{i}>": b"BODY-%03d" % i for i in range(10)}
    without = read_warc(spark, path)
    assert "payload" not in without.columns


# ---------------------------------------------- duplicate spans (Lee et al.)


def test_duplicate_spans_merge_semantics(spark):
    from h2h_spark.operators.text import duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    shared2 = "one two three four five six seven eight"
    rows = [
        # doc 1: shared at tokens 3-10, shared2 at 14-21 (gap -> 2 spans)
        (1, "x1 x2 " + shared + " y1 y2 y3 " + shared2 + " z1"),
        # doc 2: shared + an extra token + shared again -> windows overlap
        # through the junction only where 8-grams repeat elsewhere
        (2, shared + " q1 q2 q3 " + shared2),
        # doc 3: no duplicated 8-grams
        (3, "solo tokens only here nothing repeats at all ever once"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = duplicate_spans(df, "doc_id", "text", window=8, min_docs=2)
    spans = {}
    for r in out.collect():
        spans.setdefault(r["doc_id"], []).append(
            (r["span_idx"], r["start_tok"], r["end_tok"])
        )
    for v in spans.values():
        v.sort()
    # doc 1: tokens 1-2 prefix, shared at 3..10, filler 11-13, shared2 at
    # 14..21 — two disjoint maximal spans, indices 0 and 1
    assert spans[1] == [(0, 3, 10), (1, 14, 21)]
    # doc 2: shared at 1..8, shared2 at 12..19
    assert spans[2] == [(0, 1, 8), (1, 12, 19)]
    assert 3 not in spans


def test_duplicate_spans_adjacent_merge(spark):
    from h2h_spark.operators.text import duplicate_spans

    # Two docs sharing a 10-token run: overlapping 8-gram hits at
    # positions 1,2,3 merge into ONE maximal span covering 1..10.
    run = "a b c d e f g h i j"
    df = spark.createDataFrame(
        [(1, run + " tail1 only"), (2, "head2 " + run)], ["doc_id", "text"]
    )
    out = duplicate_spans(df, "doc_id", "text", window=8, min_docs=2)
    spans = {(r["doc_id"], r["span_idx"]): (r["start_tok"], r["end_tok"])
             for r in out.collect()}
    assert spans == {(1, 0): (1, 10), (2, 0): (2, 11)}


def test_excise_duplicate_spans_ownership(spark):
    from h2h_spark.operators.text import excise_duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    df = spark.createDataFrame(
        [
            (1, shared + " tail one two"),          # owner (min doc id)
            (2, "pre " + shared + " post"),         # must excise
            (3, "short text"),                       # < window -> zeros
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           excise_duplicate_spans(df, "doc_id", "text",
                                  window=8, min_docs=2).collect()}
    assert out[1]["n_tokens"] == 11
    assert out[1]["n_dup_tokens"] == 8
    assert out[1]["n_excised"] == 0          # owner keeps its copy
    assert out[1]["n_retained"] == 11
    assert out[2]["n_dup_tokens"] == 8
    assert out[2]["n_excised"] == 8
    assert out[2]["n_retained"] == 10 - 8
    assert (out[3]["n_dup_tokens"], out[3]["n_excised"],
            out[3]["n_retained"]) == (0, 0, 2)


# ---------------------------------------------------------------------------
# round 9: winnowing fingerprints (Schleimer et al. 2003)
# ---------------------------------------------------------------------------


def test_winnow_guarantee_shared_substring(spark):
    """The winnowing guarantee: a substring of >= window+k-1 tokens
    shared by two docs yields at least one SHARED fingerprint."""
    from h2h_spark.operators.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    df = spark.createDataFrame(
        [
            (1, "one two three " + shared + " four five six"),
            (2, "nine eight seven " + shared + " ten eleven"),
        ],
        "id bigint, text string",
    )
    fps = winnow_fingerprints(df, "id", "text", k=5, window=4)
    rows = fps.collect()
    fp1 = {r["fp"] for r in rows if r["id"] == 1}
    fp2 = {r["fp"] for r in rows if r["id"] == 2}
    assert fp1 & fp2, "shared 8-token substring must share a fingerprint"


def test_winnow_density_and_positions(spark):
    from h2h_spark.operators.text import winnow_fingerprints

    words = " ".join(f"w{i}a" for i in range(60))
    df = spark.createDataFrame([(1, words)], "id bigint, text string")
    fps = winnow_fingerprints(df, "id", "text", k=5, window=4).collect()
    poss = sorted(r["pos"] for r in fps)
    m = 60 - 5 + 1  # grams
    assert poss[0] >= 1 and poss[-1] <= m
    # selections cover: gaps between consecutive picks < window
    assert all(b - a <= 4 for a, b in zip(poss, poss[1:]))
    # density ~2/(window+1): picks are a strict subset of grams
    assert 0 < len(poss) < m


def test_winnow_overlap_threshold_and_cap(spark):
    from h2h_spark.operators.text import (
        winnow_fingerprints, winnow_overlap,
    )

    blob = " ".join(f"t{i}x" for i in range(30))
    df = spark.createDataFrame(
        [(1, blob), (2, blob), (3, "totally different words " * 8)],
        "id bigint, text string",
    )
    fps = winnow_fingerprints(df, "id", "text", k=5, window=4)
    pairs = winnow_overlap(fps, "id", min_shared=2).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    # a cap of 1 doc per fp drops every shared fingerprint -> no pairs
    none = winnow_overlap(fps, "id", min_shared=1, max_docs_per_fp=1)
    assert none.count() == 0


def test_exif_roundtrip_both_byteorders():
    from h2h_spark.operators.multimodal import (
        encode_exif_app1, insert_exif, parse_exif, synthesize_jpeg,
    )

    for bo in ("II", "MM"):
        app1 = encode_exif_app1(
            make="CamCo", model="X-100 Mark II", orientation=6,
            datetime_str="2024:03:01 10:11:12", width=4032, height=3024,
            iso=200, byteorder=bo,
        )
        m = parse_exif(insert_exif(synthesize_jpeg(7), app1))
        assert m["make"] == "CamCo" and m["width"] == 4032, (bo, m)
        assert m["orientation"] == 6 and m["iso"] == 200


def test_exif_absent_and_malformed():
    import pytest

    from h2h_spark.operators.multimodal import parse_exif, synthesize_jpeg

    assert all(v is None for v in parse_exif(synthesize_jpeg(3)).values())
    with pytest.raises(ValueError, match="SOI"):
        parse_exif(b"\x00\x01")
    # APP1 Exif with garbage TIFF must raise, not desync
    bad = b"\xff\xd8" + b"\xff\xe1\x00\x10Exif\x00\x00XXXXXXXX" + b"\xff\xd9"
    with pytest.raises(ValueError, match="TIFF"):
        parse_exif(bad)


def test_exif_value_longer_than_4_bytes_out_of_line():
    # Make > 4 chars forces the out-of-line value path
    from h2h_spark.operators.multimodal import (
        encode_exif_app1, insert_exif, parse_exif, synthesize_jpeg,
    )

    app1 = encode_exif_app1(make="A Very Long Camera Maker Name",
                            byteorder="MM")
    m = parse_exif(insert_exif(synthesize_jpeg(1), app1))
    assert m["make"] == "A Very Long Camera Maker Name"


def test_mp3_frame_walk_cbr_vbr_and_resync():
    from h2h_spark.operators.multimodal import encode_mp3_frames, parse_mp3

    p = encode_mp3_frames([(9, 0, i % 2) for i in range(10)], id3_bytes=64)
    m = parse_mp3(p)
    assert m["n_frames"] == 10 and m["sample_rate"] == 44100
    assert m["bitrate_kbps"] == 128 and not m["is_vbr"]
    assert m["duration_ms"] == 10 * 1152 * 1000 // 44100
    # mixed bitrates -> VBR, bitrate None
    m2 = parse_mp3(encode_mp3_frames([(5, 1, 0), (12, 1, 0)]))
    assert m2["is_vbr"] and m2["bitrate_kbps"] is None
    # junk prefix resyncs; truncated final frame is dropped, not over-read
    blob = b"\x01\x02junk" + encode_mp3_frames([(9, 0, 0), (9, 0, 0)])
    m3 = parse_mp3(blob[:-5])
    assert m3["n_frames"] == 1
    # false sync inside payload must not double-count (walk hops by
    # frame length, never scans inside an owned frame)
    frames = encode_mp3_frames([(3, 0, 0)] * 4)
    assert parse_mp3(frames)["n_frames"] == 4


def test_flac_meta_roundtrip_and_guards():
    import pytest

    from h2h_spark.operators.multimodal import (
        encode_flac_meta, parse_flac_meta,
    )

    p = encode_flac_meta(sample_rate=44100, channels=2, bits_per_sample=16,
                         total_samples=441000,
                         tags={"TITLE": "T", "ARTIST": "A", "ALBUM": "X"},
                         audio_bytes=64)
    m = parse_flac_meta(p)
    assert (m["duration_ms"], m["n_tags"], m["title"]) == (10000, 3, "T")
    with pytest.raises(ValueError, match="fLaC"):
        parse_flac_meta(b"RIFF....")
    # first block must be STREAMINFO
    bad = b"fLaC" + bytes([0x84]) + (4).to_bytes(3, "big") + b"abcd"
    with pytest.raises(ValueError, match="STREAMINFO"):
        parse_flac_meta(bad)


def test_ogg_page_walk_and_crc():
    import pytest

    from h2h_spark.operators.multimodal import encode_ogg_pages, parse_ogg

    blob = encode_ogg_pages([(1, 100, [10, 255, 300]), (2, 50, [7]),
                             (1, 200, [512])])
    st = parse_ogg(blob)
    assert st[0]["n_pages"] == 2 and st[0]["n_packets"] == 4
    assert st[0]["body_bytes"] == 10 + 255 + 300 + 512
    assert st[1] == {"serial": 2, "n_pages": 1, "n_packets": 1,
                     "body_bytes": 7, "last_granule": 50}
    bad = bytearray(blob)
    bad[40] ^= 1
    with pytest.raises(ValueError):
        parse_ogg(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        parse_ogg(blob[:-3])


def test_tiff_meta_roundtrip_both_byteorders():
    import pytest

    from h2h_spark.operators.multimodal import (
        encode_tiff_meta, parse_tiff_meta,
    )

    for bo in ("II", "MM"):
        t = encode_tiff_meta(width=800, height=600, bits=16, compression=5,
                             description="a description over four bytes",
                             byteorder=bo)
        m = parse_tiff_meta(t)
        assert (m["width"], m["height"], m["bits"], m["compression"]) == \
            (800, 600, 16, 5), bo
        assert m["description"].startswith("a description")
    with pytest.raises(ValueError, match="byte-order"):
        parse_tiff_meta(b"XXXX")
