"""File metadata — the reference's ``HdfsFileStatus`` surface.

``hdfsconnector.hpp:43-55`` defines the metadata record (accessTime,
blockSize, group, length, modificationTime, owner, pathSuffix, permission,
replication, type), populated from WebHDFS ``GETFILESTATUS`` JSON
(``webhdfsconnector.cpp:79-167``) or ``hdfsGetPathInfo``
(``libhdfsconnector.cpp:51-74,124-135``).  Here the same record comes from
the Hadoop ``FileSystem`` API through the live JVM — one client stack for
``file://``, ``hdfs://`` and ``webhdfs://`` alike.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def file_status(spark: SparkSession, path: str) -> dict:
    """HdfsFileStatus-shaped dict for ``path`` (file or directory)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(conf)
    st = fs.getFileStatus(jpath)
    return {
        "accessTime": st.getAccessTime(),
        "blockSize": st.getBlockSize(),
        "group": st.getGroup(),
        "length": st.getLen(),
        "modificationTime": st.getModificationTime(),
        "owner": st.getOwner(),
        "pathSuffix": st.getPath().getName(),
        "permission": str(st.getPermission()),
        "replication": st.getReplication(),
        "type": "DIRECTORY" if st.isDirectory() else "FILE",
    }


def total_parts_size(spark: SparkSession, parts_dir: str) -> int:
    """Sum of part sizes (``getTotalFilePartsSize``,
    ``webhdfsconnector.cpp:478-500``)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(parts_dir)
    fs = jpath.getFileSystem(conf)
    total = 0
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith("_") and not name.endswith(".crc"):
            total += st.getLen()
    return total


def parquet_rowgroup_stats(spark: SparkSession, path: str, column: str):
    """Per-row-group parquet FOOTER statistics for one column — the
    introspection behind partition-pruning audits (how many groups can
    a predicate skip?) and compaction planning (group size skew).

    Footer-only reads: the file list distributes over executors and
    each task reads just its files' metadata blocks (the same
    footer-index role the ZIP source's central-directory read plays) —
    no data pages are touched, so a 100 TB table audits at
    O(files × footer), not O(bytes).  Output: ``(file, row_group,
    n_rows, stats_min, stats_max)`` with stats as strings (the
    type-generic form parquet stores)."""
    import glob as _glob
    import os as _os

    from h2h_spark.sources.util import strip_scheme

    base = strip_scheme(path)
    files = sorted(
        _glob.glob(_os.path.join(base, "*.parquet"))
        if _os.path.isdir(base) else [base]
    )
    if not files:
        raise ValueError(f"no parquet files under {path}")
    fdf = spark.createDataFrame([(f,) for f in files], "file string")

    def _walk(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                md = pq.ParquetFile(f).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        if col.path_in_schema != column:
                            continue
                        st = col.statistics
                        rows.append((
                            _os.path.basename(f), rg, g.num_rows,
                            None if st is None else str(st.min),
                            None if st is None else str(st.max),
                        ))
            yield pd.DataFrame(
                rows,
                columns=["file", "row_group", "n_rows",
                         "stats_min", "stats_max"],
            )

    return fdf.repartition(min(len(files), 64)).mapInPandas(
        _walk,
        "file string, row_group bigint, n_rows bigint, "
        "stats_min string, stats_max string",
    )


# ---------------------------------------------------------------------------
# ORC tail walk — hand-rolled footer introspection (Apache ORC spec,
# orc.apache.org/specification/ORCv1: the file ends PostScript-last,
# whose final byte is its own length; the PostScript (uncompressed
# protobuf) names the footer's compressed length and codec; the Footer
# protobuf carries content length, row count, the type tree, and one
# StripeInformation per stripe).  Compressed streams are framed in
# chunks with a 3-byte little-endian header ``(len << 1) | isOriginal``.
# The same role as parquet_rowgroup_stats: audit the columnar files the
# engine writes with O(files x footer) reads, no data pages touched.
# Protobuf decoding reuses operators/tfexample.py's wire walker.
# ---------------------------------------------------------------------------

_ORC_CODECS = {0: "NONE", 1: "ZLIB", 2: "SNAPPY", 3: "LZO", 4: "LZ4",
               5: "ZSTD"}


def _lz4_block_decompress(
    chunk: bytes, origin: str, window: bytes = b""
) -> bytes:
    """Raw LZ4 *block* format (lz4.org spec) — what ORC feeds through
    its chunk framing.  pyarrow's codecs can't serve here: the "lz4"
    codec expects frame format, and "lz4_raw" demands the exact
    decompressed size up front, which ORC does not record per chunk.
    Token = (literal_len << 4) | (match_len - 4), 15 escapes to
    255-run extension bytes; offsets are 2-byte LE; matches may
    self-overlap (RLE), so overlapped regions copy forward.

    ``window``: dictionary/linked-block prefix (LZ4 frame blockLinked
    mode lets matches reach up to 64 KiB into PRIOR blocks' output) —
    prepended to the match window, excluded from the return value."""
    out = bytearray(window)
    wlen = len(window)
    pos = 0
    n = len(chunk)
    while pos < n:
        token = chunk[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise ValueError(f"{origin}: truncated LZ4 block "
                                     "(literal-length run)")
                b = chunk[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise ValueError(f"{origin}: LZ4 literals past end of block")
        out += chunk[pos:pos + lit]
        pos += lit
        if pos == n:
            break  # last sequence: literals only, no match
        if pos + 2 > n:
            raise ValueError(f"{origin}: truncated LZ4 match offset")
        off = chunk[pos] | (chunk[pos + 1] << 8)
        pos += 2
        if off == 0 or off > len(out):
            raise ValueError(f"{origin}: invalid LZ4 match offset {off} "
                             f"at output position {len(out)}")
        mlen = (token & 0x0F) + 4
        if mlen == 19:
            while True:
                if pos >= n:
                    raise ValueError(f"{origin}: truncated LZ4 block "
                                     "(match-length run)")
                b = chunk[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - off
        if off >= mlen:
            out += out[start:start + mlen]
        else:
            for i in range(mlen):  # overlapping match: forward copy
                out.append(out[start + i])
    return bytes(out[wlen:]) if wlen else bytes(out)


def _orc_decompress(raw: bytes, codec: str, origin: str) -> bytes:
    """Undo ORC chunk framing + codec for a metadata stream."""
    import zlib as _zlib

    if codec == "NONE":
        return raw
    out = bytearray()
    pos = 0
    while pos < len(raw):
        if pos + 3 > len(raw):
            raise ValueError(f"{origin}: truncated ORC chunk header")
        head = int.from_bytes(raw[pos:pos + 3], "little")
        pos += 3
        ln = head >> 1
        if pos + ln > len(raw):
            raise ValueError(f"{origin}: ORC chunk extends past stream")
        chunk = raw[pos:pos + ln]
        pos += ln
        if head & 1:  # isOriginal
            out += chunk
        elif codec == "ZLIB":
            out += _zlib.decompress(chunk, wbits=-15)
        elif codec == "SNAPPY":
            import pyarrow as _pa

            # raw snappy embeds the uncompressed length as a leading
            # varint — pyarrow needs it passed explicitly
            usize = 0
            shift = 0
            i = 0
            while True:
                b = chunk[i]
                usize |= (b & 0x7F) << shift
                i += 1
                shift += 7
                if not b & 0x80:
                    break
            out += _pa.decompress(chunk, codec="snappy", asbytes=True,
                                  decompressed_size=usize)
        elif codec == "ZSTD":
            import pyarrow as _pa

            stream = _pa.input_stream(
                _pa.BufferReader(chunk), compression="zstd"
            )
            out += stream.read()
        elif codec == "LZ4":
            out += _lz4_block_decompress(chunk, origin)
        elif codec == "LZO":
            # no stdlib/pyarrow decoder exists; the from-spec LZO1X
            # implementation (sources/lzo1x.py) closes the last ORC
            # codec cliff (round 12)
            from h2h_spark.sources.lzo1x import lzo1x_decompress

            out += lzo1x_decompress(chunk, origin)
        else:
            raise ValueError(f"{origin}: unsupported ORC codec {codec}")
    return bytes(out)


def parse_orc_meta(path: str) -> dict:
    """Tail-only walk of one ORC file: returns ``{codec, n_rows,
    content_length, n_types, stripes: [{offset, index_length,
    data_length, footer_length, n_rows}]}``."""
    import os as _os

    from h2h_spark.operators.tfexample import _fields
    from h2h_spark.sources.util import strip_scheme

    p = strip_scheme(path)
    size = _os.path.getsize(p)
    with open(p, "rb") as f:
        f.seek(max(0, size - 16384))
        buf = f.read()
    if len(buf) < 4 or not buf.rstrip(b"\x00"):
        raise ValueError(f"{path}: not an ORC file (empty tail)")
    ps_len = buf[-1]
    if ps_len == 0 or ps_len + 1 > len(buf):
        raise ValueError(f"{path}: implausible ORC postscript length "
                         f"{ps_len}")
    ps = buf[-1 - ps_len:-1]
    footer_len = None
    codec_id = 0
    magic = None
    try:
        for field, wt, val in _fields(ps):
            if field == 1 and wt == 0:
                footer_len = val
            elif field == 2 and wt == 0:
                codec_id = val
            elif field == 8000 and wt == 2:
                magic = val
    except (ValueError, IndexError) as e:
        raise ValueError(
            f"{path}: not an ORC file (postscript unparseable: {e})"
        ) from None
    if magic != b"ORC":
        raise ValueError(f"{path}: ORC postscript magic missing "
                         f"(got {magic!r})")
    if footer_len is None:
        raise ValueError(f"{path}: ORC postscript lacks footerLength")
    codec = _ORC_CODECS.get(codec_id)
    if codec is None:
        raise ValueError(f"{path}: unknown ORC compression id {codec_id}")
    foot_end = len(buf) - 1 - ps_len
    if footer_len > foot_end:
        # Footer larger than the initial 16 KiB tail window (valid for
        # files with many stripes / wide schemas): re-read a window
        # sized from the postscript's own footerLength.
        need = footer_len + ps_len + 1
        if need > size:
            raise ValueError(
                f"{path}: ORC footerLength {footer_len} exceeds file "
                f"size {size} — corrupt postscript"
            )
        with open(p, "rb") as f:
            f.seek(size - need)
            buf = f.read(need)
        foot_end = len(buf) - 1 - ps_len
    footer = _orc_decompress(
        buf[foot_end - footer_len:foot_end], codec, path
    )
    n_rows = None
    content_length = None
    n_types = 0
    stripes = []
    for field, wt, val in _fields(footer):
        if field == 2 and wt == 0:
            content_length = val
        elif field == 6 and wt == 0:
            n_rows = val
        elif field == 4 and wt == 2:
            n_types += 1
        elif field == 3 and wt == 2:
            si = {"offset": None, "index_length": None,
                  "data_length": None, "footer_length": None,
                  "n_rows": None}
            keys = ["offset", "index_length", "data_length",
                    "footer_length", "n_rows"]
            for f2, w2, v2 in _fields(val):
                if w2 == 0 and 1 <= f2 <= 5:
                    si[keys[f2 - 1]] = v2
            stripes.append(si)
    if n_rows is None:
        raise ValueError(f"{path}: ORC footer lacks numberOfRows")
    return {"codec": codec, "n_rows": n_rows,
            "content_length": content_length, "n_types": n_types,
            "stripes": stripes}


def orc_stripe_stats(spark: SparkSession, path: str):
    """One row per stripe per ``.orc`` file under ``path``: ``(file,
    codec, stripe, stripe_rows, data_length, file_rows, n_types)`` —
    tail-only reads, one task per file batch."""
    import glob as _glob
    import os as _os

    from h2h_spark.sources.util import strip_scheme

    base = strip_scheme(path)
    files = sorted(
        _glob.glob(_os.path.join(base, "*.orc"))
        if _os.path.isdir(base) else [base]
    )
    if not files:
        raise ValueError(f"no orc files under {path}")
    fdf = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(min(len(files), 64))

    def _walk(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                m = parse_orc_meta(f)
                for i, s in enumerate(m["stripes"]):
                    rows.append((
                        f, m["codec"], i, s["n_rows"],
                        s["data_length"], m["n_rows"], m["n_types"],
                    ))
            yield pd.DataFrame(rows, columns=[
                "file", "codec", "stripe", "stripe_rows",
                "data_length", "file_rows", "n_types",
            ])

    return fdf.mapInPandas(
        _walk,
        "file string, codec string, stripe int, stripe_rows bigint, "
        "data_length bigint, file_rows bigint, n_types int",
    )
