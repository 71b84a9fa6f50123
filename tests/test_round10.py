"""Round-10 walkers: WebP RIFF/VP8/VP8L/VP8X, ADTS/AAC framing."""

import pytest

from h2h_spark.operators.multimodal import (
    encode_adts_frames,
    encode_webp,
    parse_adts,
    parse_webp,
)


def test_webp_lossy_and_lossless_dims():
    m = parse_webp(encode_webp(width=320, height=240, flavor="lossy"))
    assert (m["format"], m["width"], m["height"], m["n_frames"]) == (
        "lossy", 320, 240, 1,
    )
    m = parse_webp(encode_webp(width=16384, height=1, flavor="lossless"))
    assert (m["format"], m["width"], m["height"]) == ("lossless", 16384, 1)


def test_webp_extended_animation_and_exif():
    m = parse_webp(encode_webp(
        width=64, height=32, flavor="extended", n_anim_frames=5,
        has_exif=True,
    ))
    assert m["format"] == "extended"
    assert (m["width"], m["height"]) == (64, 32)
    assert m["is_animated"] and m["has_exif"]
    assert m["n_frames"] == 5
    # static extended: VP8X + one VP8 chunk
    m = parse_webp(encode_webp(width=10, height=10, flavor="extended"))
    assert not m["is_animated"] and m["n_frames"] == 1


def test_webp_malformed_raises():
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        parse_webp(b"RIFFxxxxWAVE")
    good = encode_webp(width=20, height=20, flavor="lossy")
    with pytest.raises(ValueError, match="extends past|truncated"):
        parse_webp(good[:-5])
    # corrupt the VP8 start code
    bad = bytearray(good)
    bad[12 + 8 + 3] ^= 0xFF
    with pytest.raises(ValueError, match="start code"):
        parse_webp(bytes(bad))
    with pytest.raises(ValueError, match="no image chunk"):
        parse_webp(b"RIFF" + (4).to_bytes(4, "little") + b"WEBP")


def test_adts_walk_and_duration():
    # 3 frames at 48 kHz: 3*1024 samples -> 64 ms exactly
    a = encode_adts_frames([(1, 3, 100)] * 3)
    m = parse_adts(a)
    assert m["n_frames"] == 3 and m["audio_bytes"] == 3 * 107
    assert m["duration_ms"] == 3 * 1024 * 1000 // 48000
    assert m["sample_rate"] == 48000 and m["channels"] == 2
    assert m["has_crc"] is False


def test_adts_crc_header_width():
    a = encode_adts_frames([(2, 4, 50)], with_crc=True)
    m = parse_adts(a)
    assert m["has_crc"] is True and m["audio_bytes"] == 59


def test_adts_resync_and_truncation():
    a = encode_adts_frames([(1, 3, 80)] * 2)
    # junk prefix: resync finds both frames
    assert parse_adts(b"\x00junk\xff" + a)["n_frames"] == 2
    # truncated final frame: stop without over-reading
    assert parse_adts(a[:-10])["n_frames"] == 1
    # mixed sample rates -> no single rate reported, duration still exact
    b = encode_adts_frames([(1, 3, 80)]) + encode_adts_frames([(1, 4, 80)])
    m = parse_adts(b)
    assert m["sample_rate"] is None
    assert m["duration_ms"] == (
        1024 * 1000 // 48000 + 1024 * 1000 // 44100
    )


def test_webm_roundtrip_muxed():
    from h2h_spark.operators.multimodal import encode_webm, parse_webm

    b = encode_webm(duration_ms=5000, tracks=[
        {"type": "video", "codec": "V_VP9", "width": 1920, "height": 1080},
        {"type": "audio", "codec": "A_OPUS", "rate": 48000, "channels": 2},
    ])
    m = parse_webm(b)
    assert m["doctype"] == "webm" and m["duration_ms"] == 5000
    assert (m["n_tracks"], m["n_video"], m["n_audio"]) == (2, 1, 1)
    assert (m["width"], m["height"]) == (1920, 1080)
    assert (m["sample_rate"], m["channels"]) == (48000, 2)
    assert m["codecs"] == "A_OPUS,V_VP9"


def test_webm_clusters_skipped_and_guards():
    from h2h_spark.operators.multimodal import encode_webm, parse_webm

    b = encode_webm(
        duration_ms=250,
        tracks=[{"type": "audio", "codec": "A_VORBIS", "rate": 44100,
                 "channels": 1}],
        n_clusters=6,
    )
    m = parse_webm(b)
    assert m["n_tracks"] == 1 and m["sample_rate"] == 44100
    with pytest.raises(ValueError, match="EBML"):
        parse_webm(b"nope")
    # an element whose size extends past its parent must be loud
    bad = bytearray(b)
    # corrupt the Tracks element's size low byte to overflow the segment
    with pytest.raises(ValueError):
        parse_webm(bytes(bad[: len(bad) // 2]))


def test_ebml_vint_unknown_size():
    from h2h_spark.operators.multimodal import _ebml_vint

    # 0xFF = 1-byte vint with all value bits set -> unknown size
    assert _ebml_vint(b"\xff", 0, keep_marker=False)[0] == -1
    # id keeps the marker bit
    assert _ebml_vint(b"\xae", 0, keep_marker=True)[0] == 0xAE
    with pytest.raises(ValueError, match="lead byte"):
        _ebml_vint(b"\x00", 0, keep_marker=False)


def test_avif_meta_roundtrip_and_guards():
    from h2h_spark.operators.multimodal import encode_avif_meta, parse_avif

    m = parse_avif(encode_avif_meta(width=1024, height=768, bit_depth=10,
                                    has_exif=True))
    assert (m["brand"], m["width"], m["height"], m["bit_depth"]) == (
        "avif", 1024, 768, 10,
    )
    assert m["has_exif"] and m["n_items"] == 2 and not m["is_animated"]
    m = parse_avif(encode_avif_meta(width=8, height=8, animated=True))
    assert m["brand"] == "avis" and m["is_animated"]
    with pytest.raises(ValueError, match="ftyp"):
        parse_avif(b"\x00\x00\x00\x08free")
    with pytest.raises(ValueError, match="brand"):
        # a plain MP4 ftyp is NOT an AVIF/HEIF image
        parse_avif(b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00")


def test_id3_tags_versions_and_encodings():
    from h2h_spark.operators.multimodal import (
        encode_id3v2,
        encode_mp3_frames,
        parse_id3_tags,
        parse_mp3,
    )

    for v in (3, 4):
        blob = encode_id3v2(
            {"TIT2": "Ein Lied über Käse", "TPE1": "Bänd"}, version=v
        ) + encode_mp3_frames([(5, 1, 0)] * 2)
        m = parse_id3_tags(blob)
        assert m["version"] == v and m["title"] == "Ein Lied über Käse"
        assert m["artist"] == "Bänd" and m["n_frames"] == 2
        # the audio walk still finds its frames after the tag block
        assert parse_mp3(blob)["n_frames"] == 2
    # no tag block is legal, not an error
    m = parse_id3_tags(encode_mp3_frames([(5, 1, 0)]))
    assert m["version"] is None and m["n_frames"] == 0
    # latin-1 encoding byte
    frame = b"\x00caf\xe9"
    sz = bytes((len(frame) >> s) & 0x7F for s in (21, 14, 7, 0))
    raw = b"TIT2" + sz + b"\x00\x00" + frame
    ss = bytes((len(raw) >> s) & 0x7F for s in (21, 14, 7, 0))
    m = parse_id3_tags(b"ID3\x04\x00\x00" + ss + raw)
    assert m["title"] == "café"


def test_id3_truncated_frame_is_loud():
    from h2h_spark.operators.multimodal import encode_id3v2, parse_id3_tags

    blob = bytearray(encode_id3v2({"TIT2": "x" * 50}))
    # shrink the TAG size so the frame HEADER fits the declared area
    # but the frame body crosses it
    blob[8] = 0x00
    blob[9] = 0x0F
    with pytest.raises(ValueError, match="extends past"):
        parse_id3_tags(bytes(blob))
