"""Block-parallel ``.xz`` reads — from-spec container walk + stdlib
``lzma`` raw-LZMA2 block decode.

The xz container (public spec: tukaani.org xz-file-format) is built
for exactly this: ``xz -T`` cuts the payload into independently
compressed BLOCKS and records every block's unpadded/uncompressed
size in an INDEX before the stream footer.  So the scale shape is the
engine's usual one — plan from KiB (footer + index reads), fan out
disjoint block ranges, decode in parallel with no resync scan, since
the index is authoritative.  Python's stdlib ``lzma`` cannot split a
stream, but it CAN decode one block's LZMA2 payload via
``FORMAT_RAW`` once this module parses the block header's filter
chain — no new dependency.

Line-oriented consumption (``.jsonl.xz``) uses Hadoop text-split
semantics on the DECODED byte stream: a task owning blocks
``[lo, hi)`` skips through the first newline when ``lo > 0``, then
emits every line whose first byte position is <= the uncompressed
offset of block ``hi``, lazily decoding past-range blocks only to
finish the final line.  Every line is emitted exactly once across
tasks.

Supported filters: LZMA2 (mandatory last filter) with optional DELTA
and branch/call/jump prefilters (x86/PowerPC/IA64/ARM/ARM-Thumb/
SPARC via the stdlib's liblzma raw chains — the shape a ``.tar.xz``
of compiled binaries uses; ARM64/RISC-V raise loudly where this
Python's liblzma lacks them).  Block
checks (CRC32 / CRC64 / SHA-256) are verified for fully decoded
blocks; a past-range partial decode cannot be check-verified and is
not (the owning task verifies that block in full).
"""

from __future__ import annotations

import hashlib
import lzma
import struct
import zlib
from dataclasses import dataclass
from typing import BinaryIO, Iterator

XZ_MAGIC = b"\xfd7zXZ\x00"
XZ_FOOTER_MAGIC = b"YZ"
_CHECK_SIZES = {0: 0, 1: 4, 4: 8, 10: 32}
_CHECK_NAMES = {0: "none", 1: "crc32", 4: "crc64", 10: "sha256"}


class XzFormatError(ValueError):
    """Malformed xz container (always loud)."""


# xz filter id -> (name, stdlib lzma filter id or None if this build
# lacks it — ARM64/RISC-V are newer than some liblzma versions)
_BCJ_FILTERS = {
    0x04: ("x86", getattr(lzma, "FILTER_X86", None)),
    0x05: ("PowerPC", getattr(lzma, "FILTER_POWERPC", None)),
    0x06: ("IA64", getattr(lzma, "FILTER_IA64", None)),
    0x07: ("ARM", getattr(lzma, "FILTER_ARM", None)),
    0x08: ("ARM-Thumb", getattr(lzma, "FILTER_ARMTHUMB", None)),
    0x09: ("SPARC", getattr(lzma, "FILTER_SPARC", None)),
    0x0A: ("ARM64", getattr(lzma, "FILTER_ARM64", None)),
    0x0B: ("RISC-V", getattr(lzma, "FILTER_RISCV", None)),
}


def _ceil4(n: int) -> int:
    return (n + 3) & ~3


def _read_varint(buf: bytes, pos: int, what: str) -> tuple[int, int]:
    v = 0
    for i in range(9):
        if pos >= len(buf):
            raise XzFormatError(f"truncated xz varint in {what}")
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            if b == 0 and i > 0:
                raise XzFormatError(f"non-minimal xz varint in {what}")
            return v, pos
    raise XzFormatError(f"xz varint over 63 bits in {what}")


def _write_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


# CRC64-ECMA (the xz check id 4): reflected poly 0xC96C5795D7870F42.
# Real xz output defaults to CRC64, so this runs over every decoded
# byte — liblzma's own C lzma_crc64 is used when loadable (the lzma
# stdlib module guarantees the library is present), with the
# table-driven Python loop as the portable fallback.
_CRC64_TABLE: list[int] | None = None
_LZMA_CRC64 = None  # resolved lazily; False = unavailable


def _crc64_c():
    global _LZMA_CRC64
    if _LZMA_CRC64 is None:
        try:
            import ctypes
            import ctypes.util

            name = ctypes.util.find_library("lzma")
            lib = ctypes.CDLL(name) if name else None
            fn = lib.lzma_crc64 if lib else None
            if fn is not None:
                fn.restype = ctypes.c_uint64
                fn.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.c_uint64]
                # sanity vector: CRC64-ECMA("123456789")
                if fn(b"123456789", 9, 0) != 0x995DC9BBDF1939FA:
                    fn = None
            _LZMA_CRC64 = fn if fn is not None else False
        except Exception:
            _LZMA_CRC64 = False
    return _LZMA_CRC64


def _crc64(data: bytes, crc: int = 0) -> int:
    """Streaming CRC64: ``crc`` is the running value (0 to start)."""
    fn = _crc64_c()
    if fn:
        return fn(data, len(data), crc)
    global _CRC64_TABLE
    if _CRC64_TABLE is None:
        poly = 0xC96C5795D7870F42
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tbl.append(c)
        _CRC64_TABLE = tbl
    crc ^= 0xFFFFFFFFFFFFFFFF
    for b in data:
        crc = _CRC64_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFFFFFFFFFF


@dataclass
class XzBlock:
    offset: int            # compressed byte offset of the block header
    unpadded: int          # index-recorded unpadded size
    usize: int             # uncompressed size
    uoffset: int           # uncompressed offset in the logical stream
    check_type: int        # stream-flags check id


def parse_xz_blocks(path: str) -> list[XzBlock]:
    """Footer-first container walk: every stream's index is read from
    the tail (multi-stream concatenation + stream padding supported)
    and flattened into one ordered block list with compressed AND
    uncompressed offsets — O(index) bytes read, no data touched."""
    import os as _os

    from h2h_spark.sources.util import open_input, strip_scheme

    p = strip_scheme(path)
    size = _os.path.getsize(p)
    streams: list[tuple[int, int, list[tuple[int, int]]]] = []
    with open_input(p) as f:
        end = size
        while end > 0:
            # stream padding: 4-byte null groups between streams
            while end >= 4:
                f.seek(end - 4)
                if f.read(4) != b"\x00\x00\x00\x00":
                    break
                end -= 4
            if end == 0:
                break
            if end < 32:  # header 12 + one empty index 8 + footer 12
                raise XzFormatError(f"{path}: xz tail too short ({end})")
            f.seek(end - 12)
            footer = f.read(12)
            if footer[10:12] != XZ_FOOTER_MAGIC:
                raise XzFormatError(
                    f"{path}: xz footer magic missing at {end - 2}"
                )
            (f_crc,) = struct.unpack("<I", footer[0:4])
            if zlib.crc32(footer[4:10]) != f_crc:
                raise XzFormatError(f"{path}: xz footer CRC mismatch")
            (bw,) = struct.unpack("<I", footer[4:8])
            check_type = footer[9] & 0x0F
            if check_type not in _CHECK_SIZES:
                raise XzFormatError(
                    f"{path}: unsupported xz check id {check_type}"
                )
            index_size = (bw + 1) * 4
            idx_start = end - 12 - index_size
            if idx_start < 12:
                raise XzFormatError(f"{path}: xz index overruns header")
            f.seek(idx_start)
            idx = f.read(index_size)
            if idx[:1] != b"\x00":
                raise XzFormatError(
                    f"{path}: xz index indicator missing at {idx_start}"
                )
            (i_crc,) = struct.unpack("<I", idx[-4:])
            if zlib.crc32(idx[:-4]) != i_crc:
                raise XzFormatError(f"{path}: xz index CRC mismatch")
            n, pos = _read_varint(idx, 1, "index count")
            recs: list[tuple[int, int]] = []
            for _ in range(n):
                unp, pos = _read_varint(idx, pos, "index unpadded size")
                usz, pos = _read_varint(idx, pos, "index uncompressed size")
                recs.append((unp, usz))
            blocks_size = sum(_ceil4(u) for u, _ in recs)
            hdr_start = idx_start - blocks_size - 12
            if hdr_start < 0:
                raise XzFormatError(
                    f"{path}: xz blocks overrun file start"
                )
            f.seek(hdr_start)
            hdr = f.read(12)
            if hdr[:6] != XZ_MAGIC:
                raise XzFormatError(
                    f"{path}: xz stream header magic missing at "
                    f"{hdr_start}"
                )
            if hdr[6:8] != footer[8:10]:
                raise XzFormatError(
                    f"{path}: xz stream flags differ between header "
                    "and footer"
                )
            streams.append((hdr_start, check_type, recs))
            end = hdr_start
    blocks: list[XzBlock] = []
    uoff = 0
    for hdr_start, check_type, recs in reversed(streams):
        coff = hdr_start + 12
        for unp, usz in recs:
            blocks.append(XzBlock(coff, unp, usz, uoff, check_type))
            coff += _ceil4(unp)
            uoff += usz
    return blocks


def _parse_block_header(
    raw: bytes, origin: str
) -> tuple[int, list[dict]]:
    """Return (header_size, lzma-raw filter chain) for one block."""
    if not raw:
        raise XzFormatError(f"{origin}: empty xz block header")
    hsize = (raw[0] + 1) * 4
    if raw[0] == 0:
        raise XzFormatError(
            f"{origin}: index indicator where a block was expected"
        )
    if len(raw) < hsize:
        raise XzFormatError(f"{origin}: truncated xz block header")
    (h_crc,) = struct.unpack("<I", raw[hsize - 4:hsize])
    if zlib.crc32(raw[:hsize - 4]) != h_crc:
        raise XzFormatError(f"{origin}: xz block header CRC mismatch")
    flags = raw[1]
    if flags & 0x3C:
        raise XzFormatError(
            f"{origin}: reserved xz block flags set ({flags:#x})"
        )
    n_filters = (flags & 3) + 1
    pos = 2
    if flags & 0x40:  # compressed size present
        _, pos = _read_varint(raw, pos, "block compressed size")
    if flags & 0x80:  # uncompressed size present
        _, pos = _read_varint(raw, pos, "block uncompressed size")
    chain: list[dict] = []
    for _ in range(n_filters):
        fid, pos = _read_varint(raw, pos, "filter id")
        plen, pos = _read_varint(raw, pos, "filter props size")
        props = raw[pos:pos + plen]
        pos += plen
        if fid == 0x21:  # LZMA2
            if plen != 1 or props[0] & 0xC0:
                raise XzFormatError(
                    f"{origin}: bad LZMA2 props {props!r}"
                )
            v = props[0] & 0x3F
            if v > 40:
                raise XzFormatError(
                    f"{origin}: LZMA2 dict-size code {v} out of range"
                )
            dict_size = (
                0xFFFFFFFF if v == 40
                else (2 | (v & 1)) << (v // 2 + 11)
            )
            chain.append({"id": lzma.FILTER_LZMA2,
                          "dict_size": dict_size})
        elif fid == 0x03:  # DELTA
            if plen != 1:
                raise XzFormatError(f"{origin}: bad DELTA props")
            chain.append({"id": lzma.FILTER_DELTA,
                          "dist": props[0] + 1})
        elif fid in _BCJ_FILTERS:
            # branch/call/jump prefilter (x86 the common case for
            # .tar.xz of compiled binaries).  Props are empty or a
            # 4-byte little-endian start offset (xz-file-format §5.3.2)
            name, stdlib_id = _BCJ_FILTERS[fid]
            if stdlib_id is None:
                raise XzFormatError(
                    f"{origin}: xz BCJ filter {name} not supported by "
                    "this Python's liblzma build"
                )
            if plen == 0:
                chain.append({"id": stdlib_id})
            elif plen == 4:
                (start,) = struct.unpack("<I", props)
                chain.append({"id": stdlib_id, "start_offset": start})
            else:
                raise XzFormatError(
                    f"{origin}: bad {name} props length {plen}"
                )
        else:
            raise XzFormatError(
                f"{origin}: unsupported xz filter id {fid:#x} "
                "(LZMA2, DELTA and the BCJ set are implemented)"
            )
    if not chain or chain[-1]["id"] != lzma.FILTER_LZMA2:
        raise XzFormatError(
            f"{origin}: xz filter chain must end with LZMA2"
        )
    return hsize, chain


def iter_xz_block_bytes(
    f: BinaryIO,
    blk: XzBlock,
    origin: str,
    *,
    chunk: int = 1 << 20,
    verify: bool = True,
) -> Iterator[bytes]:
    """Decode ONE block, yielding uncompressed chunks.  Consumers that
    stop early (read-past-range line finishing) skip the check — the
    owning task decodes the block in full and verifies."""
    f.seek(blk.offset)
    head = f.read(min(_ceil4(blk.unpadded), 1024 + 4))
    hsize, chain = _parse_block_header(head, origin)
    comp_end = blk.offset + blk.unpadded - _CHECK_SIZES[blk.check_type]
    d = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=chain)
    f.seek(blk.offset + hsize)
    remaining = comp_end - (blk.offset + hsize)
    if remaining < 0:
        raise XzFormatError(f"{origin}: xz block sizes inconsistent")
    hasher = None
    if verify:
        if blk.check_type == 1:
            hasher = ["crc32", 0]
        elif blk.check_type == 4:
            hasher = ["crc64", 0]
        elif blk.check_type == 10:
            hasher = ["sha256", hashlib.sha256()]
    total = 0
    while remaining > 0 or not d.eof:
        if d.needs_input:
            if remaining <= 0:
                raise XzFormatError(
                    f"{origin}: xz block data ended before LZMA2 "
                    "end marker"
                )
            data = f.read(min(chunk, remaining))
            if not data:
                raise XzFormatError(f"{origin}: xz block truncated")
            remaining -= len(data)
        else:
            data = b""
        try:
            out = d.decompress(data, max_length=chunk)
        except lzma.LZMAError as e:
            raise XzFormatError(
                f"{origin}: LZMA2 decode failed: {e}"
            ) from None
        while True:
            if out:
                total += len(out)
                if hasher is not None:
                    if hasher[0] == "crc32":
                        hasher[1] = zlib.crc32(out, hasher[1])
                    elif hasher[0] == "crc64":
                        hasher[1] = _crc64(out, hasher[1])
                    else:
                        hasher[1].update(out)
                yield out
            if d.eof or d.needs_input:
                break
            out = d.decompress(b"", max_length=chunk)
        if d.eof:
            break
    if total != blk.usize:
        raise XzFormatError(
            f"{origin}: xz block decoded {total} bytes, index says "
            f"{blk.usize}"
        )
    if hasher is not None and blk.check_type:
        # block padding (0-3 nulls) sits BETWEEN compressed data and
        # the check field; header and check sizes are 4-aligned
        comp_len = comp_end - (blk.offset + hsize)
        f.seek(blk.offset + hsize + _ceil4(comp_len))
        stored = f.read(_CHECK_SIZES[blk.check_type])
        if blk.check_type == 1:
            ok = struct.pack("<I", hasher[1] & 0xFFFFFFFF) == stored
        elif blk.check_type == 4:
            ok = struct.pack("<Q", hasher[1]) == stored
        else:
            ok = hasher[1].digest() == stored
        if not ok:
            raise XzFormatError(
                f"{origin}: xz block check "
                f"({_CHECK_NAMES[blk.check_type]}) mismatch"
            )


def xz_block_lines(
    path: str, blk_lo: int, blk_hi: int,
    blocks: list[XzBlock] | None = None,
) -> Iterator[bytes]:
    """Lines whose FIRST byte lies in blocks ``[blk_lo, blk_hi)`` of
    the decoded stream, Hadoop text-split semantics (see module
    docstring).  Yields raw line bytes without the newline."""
    from h2h_spark.sources.util import open_input, strip_scheme

    meta = blocks if blocks is not None else parse_xz_blocks(path)
    if not meta or blk_lo >= len(meta):
        return
    blk_hi = min(blk_hi, len(meta))
    end_uoff = (
        meta[blk_hi].uoffset if blk_hi < len(meta)
        else meta[-1].uoffset + meta[-1].usize
    )
    with open_input(strip_scheme(path)) as f:

        def gen() -> Iterator[bytes]:
            for b in range(blk_lo, len(meta)):
                # owned blocks verify their check; past-range blocks
                # are partially decoded at most, so skip verification
                yield from iter_xz_block_bytes(
                    f, meta[b], path, verify=b < blk_hi
                )

        chunks = gen()
        buf = b""
        pos = meta[blk_lo].uoffset
        if blk_lo > 0:
            # skip through the first newline: those bytes belong to
            # the previous task, which reads one line past its range.
            # pos always tracks the decoded-stream position of buf[0].
            while True:
                nl = buf.find(b"\n")
                if nl >= 0:
                    pos += nl + 1
                    buf = buf[nl + 1:]
                    break
                pos += len(buf)
                nxt = next(chunks, None)
                if nxt is None:
                    return
                buf = nxt
        # chunk-batched line splitting: one split() per decoded chunk,
        # never a per-line re-slice of the buffer (that is quadratic
        # in block size and was measured 5x slower than the stream
        # path before round 12 fixed it)
        leftover = buf
        while True:
            parts = leftover.split(b"\n")
            leftover = parts.pop()
            for ln in parts:
                if pos > end_uoff:
                    return
                yield ln
                pos += len(ln) + 1
            if pos > end_uoff:
                return
            nxt = next(chunks, None)
            if nxt is None:
                if leftover:
                    yield leftover
                return
            leftover += nxt


def fetch_xz_blocks(spark, locs) -> "object":
    """Index-driven POINT FETCH into block-structured ``.xz`` shards —
    the xz twin of ``jsonl.fetch_zst_frames``: given ``locs`` rows
    ``(file, block)``, each task reads its files' footer indexes (one
    tail read per file), decodes ONLY the named blocks, and emits
    their lines as ``(file, block, line_no, line)``.  Retrieving K
    documents costs O(K x block) bytes, never a scan.  Locations are
    grouped per file and fetched in block order for IO locality; an
    out-of-range block index is a loud error (a silent skip would
    make a stale index look like missing data).  Assumes line-aligned
    blocks (the writer's contract when chunks end on newlines)."""
    from pyspark.sql import functions as F  # noqa: F401

    def _run(batches):
        import pandas as pd

        from h2h_spark.sources.util import open_input, strip_scheme

        for pdf in batches:
            by_file: dict[str, list[int]] = {}
            for fpath, b in zip(pdf["file"], pdf["block"]):
                by_file.setdefault(fpath, []).append(int(b))
            rows = []
            for fpath, blks in sorted(by_file.items()):
                meta = parse_xz_blocks(fpath)
                with open_input(strip_scheme(fpath)) as fh:
                    for b in sorted(set(blks)):
                        if b < 0 or b >= len(meta):
                            raise XzFormatError(
                                f"{fpath}: block {b} out of range "
                                f"(file has {len(meta)} blocks) — "
                                "stale index?"
                            )
                        plain = b"".join(
                            iter_xz_block_bytes(fh, meta[b], fpath)
                        )
                        for i, ln in enumerate(
                            plain.split(b"\n")
                        ):
                            if ln:
                                rows.append(
                                    (fpath, b, i, ln.decode("utf-8"))
                                )
            yield pd.DataFrame(
                rows, columns=["file", "block", "line_no", "line"]
            )

    return locs.repartition("file").mapInPandas(
        _run, "file string, block int, line_no int, line string"
    )


# ---------------------------------------------------------------------------
# fixture/interop writer
# ---------------------------------------------------------------------------


def write_xz_blocks(
    path: str, chunks: list[bytes], *, preset: int = 6,
    check: str = "crc32", bcj: str | None = None,
) -> None:
    """Multi-block single-stream ``.xz`` writer (the layout
    ``xz -T/--block-size`` produces): each chunk becomes one
    independently decodable block, sizes recorded in the index.
    Stdlib ``lzma`` alone cannot produce multi-block files, so the
    container framing is assembled here from the same spec the reader
    implements; payloads are raw LZMA2 from the stdlib compressor.
    ``bcj`` prepends a branch/call/jump prefilter (``"x86"``,
    ``"powerpc"``, ``"ia64"``, ``"arm"``, ``"armthumb"``,
    ``"sparc"``) to every block's chain — the ``xz --x86`` shape."""
    check_id = {"none": 0, "crc32": 1, "crc64": 4, "sha256": 10}[check]
    flags = bytes([0x00, check_id])
    bcj_hdr = b""
    bcj_filt: list[dict] = []
    if bcj is not None:
        xz_id = {"x86": 0x04, "powerpc": 0x05, "ia64": 0x06,
                 "arm": 0x07, "armthumb": 0x08, "sparc": 0x09}[bcj]
        name, stdlib_id = _BCJ_FILTERS[xz_id]
        if stdlib_id is None:
            raise XzFormatError(
                f"BCJ filter {name} not supported by this Python's "
                "liblzma build"
            )
        bcj_hdr = bytes([xz_id, 0x00])  # filter id + empty props
        bcj_filt = [{"id": stdlib_id}]
    # LZMA2 props byte = dict-size code: size = (2 | (v & 1)) << (v//2
    # + 11).  The header must declare AT LEAST the dictionary the
    # compressor used, or strict decoders reject/misdecode match
    # distances beyond the declared window (ADVICE r12) — derive it
    # from the preset's liblzma dict size (xz(1) -0..-9:
    # 256Ki,1Mi,2Mi,4Mi,4Mi,8Mi,8Mi,16Mi,32Mi,64Mi).
    preset_dict = {
        0: 1 << 18, 1: 1 << 20, 2: 1 << 21, 3: 1 << 22, 4: 1 << 22,
        5: 1 << 23, 6: 1 << 23, 7: 1 << 24, 8: 1 << 25, 9: 1 << 26,
    }[preset & 0x1F]  # mask off EXTREME flag: same dict sizes
    dict_size_code = 2 * (preset_dict.bit_length() - 1) - 24
    assert (2 | (dict_size_code & 1)) << (dict_size_code // 2 + 11) \
        == preset_dict
    filt = bcj_filt + [{"id": lzma.FILTER_LZMA2, "preset": preset}]
    out = bytearray()
    out += XZ_MAGIC + flags + struct.pack("<I", zlib.crc32(flags))
    recs: list[tuple[int, int]] = []
    for chunk in chunks:
        comp = lzma.compress(chunk, format=lzma.FORMAT_RAW, filters=filt)
        # block header: size byte + flags (low bits = n_filters-1) +
        # optional BCJ filter entry + LZMA2 filter flags + pad + CRC
        body = (bytes([0x01 if bcj_filt else 0x00]) + bcj_hdr
                + bytes([0x21, 0x01, dict_size_code]))
        hsize = _ceil4(1 + len(body) + 4)
        pad = hsize - 4 - 1 - len(body)
        hdr_wo_crc = bytes([hsize // 4 - 1]) + body + b"\x00" * pad
        hdr = hdr_wo_crc + struct.pack("<I", zlib.crc32(hdr_wo_crc))
        if check_id == 0:
            chk = b""
        elif check_id == 1:
            chk = struct.pack("<I", zlib.crc32(chunk))
        elif check_id == 4:
            chk = struct.pack("<Q", _crc64(chunk))
        else:
            chk = hashlib.sha256(chunk).digest()
        unpadded = len(hdr) + len(comp) + len(chk)
        out += hdr + comp + b"\x00" * (_ceil4(len(comp)) - len(comp)) + chk
        # NOTE: padding goes between compressed data and the check
        recs.append((unpadded, len(chunk)))
    idx = bytearray(b"\x00") + _write_varint(len(recs))
    for unp, usz in recs:
        idx += _write_varint(unp) + _write_varint(usz)
    idx += b"\x00" * (_ceil4(len(idx)) - len(idx))
    idx += struct.pack("<I", zlib.crc32(idx))
    bw = struct.pack("<I", len(idx) // 4 - 1)
    out += idx
    out += struct.pack("<I", zlib.crc32(bw + flags)) + bw + flags
    out += XZ_FOOTER_MAGIC
    with open(path, "wb") as f:
        f.write(bytes(out))
