

def test_orc_tail_walk_codecs(spark, tmp_work):
    """Hand-rolled ORC PostScript/Footer walk agrees with what Spark
    wrote, across the supported codec set; loud failure paths."""
    import glob

    import pytest

    from h2h_spark.sources.meta import parse_orc_meta

    for codec in ("zlib", "snappy", "zstd", "lz4", "lzo", "none"):
        out = f"{tmp_work}/orc_{codec}"
        spark.range(5000).selectExpr(
            "id", "concat('s', id) as s"
        ).coalesce(1).write.option("compression", codec).orc(out)
        f = glob.glob(out + "/*.orc")[0]
        m = parse_orc_meta(f)
        assert m["codec"] == ("NONE" if codec == "none" else codec.upper())
        assert m["n_rows"] == 5000
        assert sum(s["n_rows"] for s in m["stripes"]) == 5000
        assert m["n_types"] == 3  # root struct + 2 columns
    # not-an-ORC file is loud
    bad = f"{tmp_work}/bad.orc"
    open(bad, "wb").write(b"PAR1" + b"\x00" * 64 + b"\x07")
    with pytest.raises(ValueError, match="magic|postscript|ORC"):
        parse_orc_meta(bad)
    # LZO/LZ4 rejected loudly by the codec table, not silently skipped
    good = glob.glob(f"{tmp_work}/orc_zlib/*.orc")[0]
    raw = bytearray(open(good, "rb").read())
    # flip the postscript compression varint (field 2) is fiddly;
    # assert via the decompress helper directly instead
    from h2h_spark.sources.meta import _orc_decompress

    # LZO is decoded from-spec since round 12 (sources/lzo1x.py) — a
    # garbage chunk must fail ITS loud path, not silently pass
    with pytest.raises(ValueError, match="LZO1X|lzo1x|stream end"):
        _orc_decompress(b"\x06\x00\x00abc", "LZO", "t")
    # a genuinely unknown codec id stays loud at the table
    with pytest.raises(ValueError, match="unsupported ORC codec"):
        _orc_decompress(b"\x06\x00\x00abc", "BROTLI", "t")
