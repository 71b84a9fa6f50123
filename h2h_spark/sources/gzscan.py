"""Validated gzip-member resync — the shared split discipline for
member-gzipped container formats (.warc.gz, member-gzipped .tar.gz).

A member-gzipped archive concatenates independent gzip members, one per
logical record (the Common Crawl WARC layout), which makes the archive
splittable at member boundaries even though gzip itself is not
splittable.  The engine applies the same candidate-scan-then-validate
discipline as its FLAT/CSV/WARC splitters (the reference realigns at an
arbitrary byte offset and reads past the range end to finish the record
that *starts* inside the range — ``libhdfsconnector.cpp:76-96``):

- scan the raw byte range for the gzip magic ``1f 8b 08``;
- VALIDATE each candidate by inflating a probe window and handing the
  plaintext prefix to a format-specific predicate (WARC: starts with
  ``WARC/1.0\\r\\n``; tar: the first 512 bytes checksum as a ustar
  header) — magic bytes inside compressed data cost one failed
  validation, never a desync;
- ownership is by member start offset; the member body may extend past
  the range end (read-past-range, never double-emitted).

Memory per task is O(one member's plaintext + chunk), never O(range).
"""

from __future__ import annotations

import struct
import zlib
from typing import Callable, Iterator

from h2h_spark.sources.util import file_size, open_input

GZ_MAGIC = b"\x1f\x8b\x08"
ZST_MAGIC = b"\x28\xb5\x2f\xfd"  # RFC 8878 §3.1.1 (LE 0xFD2FB528)
_CHUNK = 1 << 20  # 1 MiB streaming read unit
_PROBE_COMPRESSED_CAP = 64 * 1024  # bound on compressed bytes per probe


def _have_zstandard() -> bool:
    """True when the C ``zstandard`` package is importable (cached)."""
    global _HAVE_ZSTANDARD
    if _HAVE_ZSTANDARD is None:
        try:
            import zstandard  # noqa: F401

            _HAVE_ZSTANDARD = True
        except ImportError:
            _HAVE_ZSTANDARD = False
    return _HAVE_ZSTANDARD


_HAVE_ZSTANDARD: bool | None = None


class GzMemberScanner:
    """Stream ``(offset, plaintext)`` for every gzip member whose
    compressed start lies in ``[start, end)``.

    ``validate(plain_prefix)`` decides whether a candidate magic hit is a
    real member boundary; the scanner inflates up to ``probe_plain``
    plaintext bytes for it (fewer only if the member itself is shorter).
    """

    def __init__(
        self,
        path: str,
        start: int,
        end: int,
        validate: Callable[[bytes], bool],
        probe_plain: int = 256,
    ):
        self.path = path
        self.size = file_size(path)
        self.start = start
        self.end = end
        self.validate = validate
        self.probe_plain = probe_plain

    def _validate(self, f, pos: int) -> bool:
        """Inflate a probe window at ``pos``; true iff it decompresses
        cleanly and the plaintext prefix satisfies the format predicate."""
        f.seek(pos)
        d = zlib.decompressobj(31)
        plain = b""
        read = 0
        while len(plain) < self.probe_plain and not d.eof:
            chunk = f.read(min(4096, _PROBE_COMPRESSED_CAP - read))
            if not chunk:
                break
            read += len(chunk)
            try:
                plain += d.decompress(chunk, self.probe_plain - len(plain))
            except zlib.error:
                return False
            if read >= _PROBE_COMPRESSED_CAP:
                break
        return bool(plain) and self.validate(plain)

    def _align(self, f) -> int | None:
        if self.start == 0:
            return 0
        pos = self.start
        buf = b""
        buf_at = pos
        while True:
            if not buf:
                f.seek(buf_at)
                buf = f.read(_CHUNK)
                if not buf:
                    return None
            idx = buf.find(GZ_MAGIC)
            if idx < 0:
                if buf_at + len(buf) - 2 >= self.end:
                    return None
                buf_at += len(buf) - 2
                buf = buf[-2:]
                # Re-seek before refilling: a preceding failed _validate()
                # moved the file position (it seeks to the candidate and
                # reads the probe window), so a bare read here would desync
                # the buf/buf_at mapping and silently drop every record in
                # the partition after any false-positive gzip magic.
                f.seek(buf_at + len(buf))
                nxt = f.read(_CHUNK)
                if not nxt:
                    return None
                buf += nxt
                continue
            cand = buf_at + idx
            if cand >= self.end:
                return None
            if self._validate(f, cand):
                return cand
            # false positive (magic bytes inside compressed data)
            buf = buf[idx + 1:]
            buf_at = cand + 1

    def members(self) -> Iterator[tuple[int, bytes]]:
        """Yield ``(compressed_offset, plaintext)`` per owned member."""
        with open_input(self.path) as f:
            pos = self._align(f)
            if pos is None:
                return
            while pos < self.end and pos < self.size:
                f.seek(pos)
                d = zlib.decompressobj(31)
                plain = bytearray()
                consumed = 0
                while not d.eof:
                    chunk = f.read(_CHUNK)
                    if not chunk:
                        raise ValueError(
                            f"truncated gzip member at offset {pos}"
                        )
                    plain += d.decompress(chunk)
                    consumed += len(chunk) - len(d.unused_data)
                    if d.eof:
                        break
                yield pos, bytes(plain)
                pos += consumed


class GzStreamReader:
    """Sequential chunked reader over a whole (single- or multi-member)
    gzip stream — the unsplittable fallback for conventional ``.tar.gz``
    (one deflate stream over the whole archive; there is no boundary a
    task could resync to, so the planner assigns the whole file to one
    task and documents the cliff, the way the reference documents its
    webhdfs-no-XML limitation).  Memory is O(chunk)."""

    def __init__(self, path: str):
        self.path = path

    def chunks(self) -> Iterator[bytes]:
        with open_input(self.path) as f:
            d = zlib.decompressobj(31)
            fed_current = False  # bytes fed to d since its last reset
            pending = b""  # compressed bytes read but not yet consumed
            file_done = False
            while True:
                if not pending:
                    if file_done:
                        break
                    pending = f.read(_CHUNK)
                    if not pending:
                        file_done = True
                        continue
                fed_current = True
                out = d.decompress(pending, _CHUNK)
                if out:
                    yield out
                if d.eof:
                    # concatenated members: restart on the remainder
                    rest = d.unused_data
                    if rest and rest.count(0) == len(rest):
                        rest = b""  # trailing zero padding, not a member
                    pending = rest
                    d = zlib.decompressobj(31)
                    fed_current = False
                else:
                    pending = d.unconsumed_tail
            if fed_current and not d.eof:
                raise ValueError(f"truncated gzip stream in {self.path}")


def detect_member_layout(path: str, probe_cap: int = 1 << 20) -> str:
    """``"member"`` iff the first gzip member ends before the file does
    (within ``probe_cap`` compressed bytes — a first member bigger than
    the cap reads as a stream, which stays correct, just serial)."""
    size = file_size(path)
    with open_input(path) as f:
        d = zlib.decompressobj(31)
        consumed = 0
        while consumed < probe_cap:
            chunk = f.read(64 * 1024)
            if not chunk:
                break
            d.decompress(chunk)
            consumed += len(chunk) - len(d.unused_data)
            if d.eof:
                return "member" if consumed < size else "stream"
    return "stream"


class CodecStreamReader:
    """Sequential chunked reader over a non-gzip compressed stream —
    bz2 / xz from the stdlib, zstd when the ``zstandard`` package is
    installed (import-gated: this container does not ship it, but the
    dispatch point is where a deployment plugs it in).  These codecs
    have no cheap member-resync path here, so files read as one task
    each; parallelism across files still applies.  Memory O(chunk)."""

    def __init__(self, path: str, codec: str):
        if codec not in ("bz2", "xz", "zst", "lz4"):
            raise ValueError(f"unsupported stream codec {codec!r}")
        self.path = path
        self.codec = codec

    def chunks(self) -> Iterator[bytes]:
        raw = open_input(self.path)
        try:
            if self.codec == "bz2":
                import bz2

                f = bz2.BZ2File(raw)
            elif self.codec == "xz":
                import lzma

                f = lzma.LZMAFile(raw)
            elif self.codec == "lz4":
                import pyarrow as pa

                f = pa.CompressedInputStream(raw, "lz4")
            else:
                try:
                    import zstandard

                    f = zstandard.ZstdDecompressor().stream_reader(raw)
                except ImportError:  # pyarrow bundles a zstd codec
                    import pyarrow as pa

                    f = pa.CompressedInputStream(raw, "zstd")
            while True:
                try:
                    out = f.read(_CHUNK)
                except (OSError, EOFError) as e:
                    raise ValueError(
                        f"corrupt/truncated {self.codec} stream in "
                        f"{self.path}: {e}"
                    ) from e
                if not out:
                    return
                yield out
        finally:
            raw.close()


# ---------------------------------------------------------------------------
# zstd member framing (RFC 8878) — same split discipline, different codec.
#
# Dolma and RedPajama-v2 ship ``.jsonl.zst`` shards; zstd's frame format
# supports the identical member-framing trick as gzip: one independent
# frame per block of whole lines makes the shard splittable at frame
# boundaries.  Two properties make the zstd path even cheaper than gzip:
#
# - every BLOCK header (3 bytes) carries the block's ON-DISK size, so a
#   frame's compressed extent is computable by walking headers WITHOUT
#   decompressing anything (``zst_frame_len``) — structural validation
#   (reserved bits, block types, bounded sizes) comes for free and kills
#   nearly all false magic hits before any inflate;
# - one-shot frames (the member layout) carry Frame_Content_Size, so the
#   full decompress is a single sized call.
#
# Decompression uses the ``zstandard`` package when installed, else the
# zstd codec that ships inside pyarrow (always present here).
# ---------------------------------------------------------------------------

_ZST_SKIPPABLE_LO = 0x184D2A50  # skippable-frame magics (16 values)
_ZST_SKIPPABLE_HI = 0x184D2A5F
# the IIPC "WARC zstd" draft reserves 0x184D2A5D for a skippable frame
# carrying the compression dictionary at the head of the file
ZST_DICT_FRAME_MAGIC = b"\x5d\x2a\x4d\x18"
# a structured zstd dictionary begins with this magic followed by its
# 4-byte little-endian Dictionary_ID (RFC 8878 §5)
_ZDICT_MAGIC = b"\x37\xa4\x30\xec"  # 0xEC30A437 LE


# facebook/zstd "seekable format" (contrib/seekable_format, public
# spec): a member-framed archive ends with a SEEK TABLE in a skippable
# frame (magic 0x184D2A5E) whose footer carries 0x8F92EAB1 — per-frame
# (compressed_size, decompressed_size) entries turn split planning into
# exact O(frames) metadata with zero candidate scanning.
ZST_SEEKABLE_FRAME_MAGIC = b"\x5e\x2a\x4d\x18"  # 0x184D2A5E LE
_ZST_SEEKABLE_FOOTER_MAGIC = b"\xb1\xea\x92\x8f"  # 0x8F92EAB1 LE


class ZstFrameError(ValueError):
    """Candidate bytes do not parse as a zstd frame."""


def zst_seek_table(path: str) -> list[tuple[int, int, int]] | None:
    """Read the trailing seekable-format seek table: ``[(compressed_off,
    compressed_len, decompressed_len)]`` per frame, or ``None`` when the
    file carries no seek table (fall back to the candidate scan).  One
    footer-sized read plans the whole file; malformed tables raise
    loudly rather than degrade to scanning (a silent fallback would
    mask corruption)."""
    size = file_size(path)
    if size < 26:  # skippable hdr (8) + footer (9) + one frame (>=9)
        return None
    with open_input(path) as f:
        f.seek(size - 9)
        footer = f.read(9)
        if footer[5:9] != _ZST_SEEKABLE_FOOTER_MAGIC:
            return None
        n_frames = int.from_bytes(footer[0:4], "little")
        desc = footer[4]
        if desc & 0x7C:  # reserved descriptor bits must be zero
            raise ValueError(
                f"{path}: reserved seek-table descriptor bits set"
            )
        entry = 12 if desc & 0x80 else 8  # checksum flag adds 4 bytes
        tbl_len = n_frames * entry + 9
        frames_end = size - tbl_len - 8
        if frames_end < 0:
            raise ValueError(f"{path}: seek table larger than the file")
        f.seek(frames_end)
        hdr = f.read(8)
        if hdr[:4] != ZST_SEEKABLE_FRAME_MAGIC:
            raise ValueError(
                f"{path}: seekable footer magic present but the seek "
                f"table's skippable-frame header is missing"
            )
        if int.from_bytes(hdr[4:8], "little") != tbl_len:
            raise ValueError(f"{path}: seek-table frame length mismatch")
        data = f.read(tbl_len - 9)
    out: list[tuple[int, int, int]] = []
    off = 0
    p = 0
    for _ in range(n_frames):
        clen = int.from_bytes(data[p:p + 4], "little")
        dlen = int.from_bytes(data[p + 4:p + 8], "little")
        p += entry
        out.append((off, clen, dlen))
        off += clen
    if off != frames_end:
        raise ValueError(
            f"{path}: seek table sums to {off} compressed bytes but the "
            f"frame area spans {frames_end}"
        )
    return out


def write_zst_seek_table(f, entries: list[tuple[int, int]]) -> None:
    """Append a seekable-format seek table to open file ``f``:
    ``entries`` = per-frame ``(compressed_len, decompressed_len)`` in
    file order (no per-frame checksums)."""
    body = b"".join(
        c.to_bytes(4, "little") + d.to_bytes(4, "little")
        for c, d in entries
    )
    tbl_len = len(body) + 9
    f.write(ZST_SEEKABLE_FRAME_MAGIC + tbl_len.to_bytes(4, "little"))
    f.write(body)
    f.write(
        len(entries).to_bytes(4, "little")
        + b"\x00"
        + _ZST_SEEKABLE_FOOTER_MAGIC
    )


def _zst_parse_header(hdr: bytes) -> tuple[int, int | None, bool, int]:
    """Parse a zstd frame header prefix (``hdr`` = bytes at the frame
    start, >= 18 bytes or the whole remaining file).  Returns
    ``(header_len, content_size | None, has_checksum, dict_id)`` —
    ``dict_id`` is 0 when the frame declares no dictionary; raises
    ``ZstFrameError`` on structural violations."""
    if len(hdr) < 6 or hdr[:4] != ZST_MAGIC:
        raise ZstFrameError("no zstd magic")
    fhd = hdr[4]
    if fhd & 0x08:  # reserved bit (RFC 8878 §3.1.1.1.1) must be 0
        raise ZstFrameError("reserved frame-header bit set")
    single_segment = bool(fhd & 0x20)
    fcs_flag = fhd >> 6
    did_flag = fhd & 0x03
    has_checksum = bool(fhd & 0x04)
    pos = 5
    if not single_segment:
        pos += 1  # Window_Descriptor
    did_len = (0, 1, 2, 4)[did_flag]
    if len(hdr) < pos + did_len:
        raise ZstFrameError("truncated frame header")
    dict_id = int.from_bytes(hdr[pos:pos + did_len], "little")
    pos += did_len
    fcs_len = (0, 2, 4, 8)[fcs_flag]
    if fcs_flag == 0 and single_segment:
        fcs_len = 1
    if len(hdr) < pos + fcs_len:
        raise ZstFrameError("truncated frame header")
    content_size: int | None = None
    if fcs_len:
        content_size = int.from_bytes(hdr[pos:pos + fcs_len], "little")
        if fcs_len == 2:
            content_size += 256
    pos += fcs_len
    return pos, content_size, has_checksum, dict_id


def zst_frame_len(f, pos: int, size: int) -> tuple[int, int | None]:
    """``(compressed_frame_len, content_size | None)`` of the frame at
    ``pos`` — see ``zst_frame_info``."""
    flen, csize, _ = zst_frame_info(f, pos, size)
    return flen, csize


def zst_frame_info(f, pos: int, size: int) -> tuple[int, int | None, int]:
    """Walk block headers of the zstd frame starting at byte ``pos`` of
    open file ``f`` and return ``(compressed_frame_len,
    content_size | None, dict_id)`` without decompressing.  Raises
    ``ZstFrameError`` if the bytes are not a structurally valid frame
    (the false-positive path of the candidate scan)."""
    f.seek(pos)
    hdr = f.read(18)
    hlen, content_size, has_checksum, dict_id = _zst_parse_header(hdr)
    off = pos + hlen
    while True:
        if off + 3 > size:
            raise ZstFrameError("truncated block header")
        f.seek(off)
        bh = int.from_bytes(f.read(3), "little")
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 3:  # reserved block type
            raise ZstFrameError("reserved block type")
        on_disk = 1 if btype == 1 else bsize  # RLE stores one byte
        off += 3 + on_disk
        if off > size:
            raise ZstFrameError("block extends past end of file")
        if last:
            break
    if has_checksum:
        off += 4
        if off > size:
            raise ZstFrameError("checksum extends past end of file")
    return off - pos, content_size, dict_id


def read_zst_dictionary(path: str) -> tuple[bytes | None, int | None]:
    """Parse a LEADING dictionary skippable frame (IIPC .warc.zst draft,
    magic 0x184D2A5D) and return ``(dict_bytes, dict_id)`` —
    ``(None, None)`` when the file carries no dictionary frame.  The
    skippable content may itself be a one-shot zstd frame (a compressed
    dictionary) — that layer is inflated with the PLAIN codec
    (compressing the dictionary itself uses no dictionary), so the
    extraction works without the ``zstandard`` package; only the DECODE
    of data frames against the dictionary requires it.  ``dict_id`` is
    read from the structured-dictionary magic (RFC 8878 §5) when
    present; raw-content dictionaries return ``None`` (no embedded id
    to cross-check)."""
    with open_input(path) as f:
        head = f.read(8)
        if len(head) < 8 or head[:4] != ZST_DICT_FRAME_MAGIC:
            return None, None
        ln = int.from_bytes(head[4:8], "little")
        content = f.read(ln)
    if len(content) < ln:
        raise ValueError(f"{path}: truncated zstd dictionary frame")
    if content[:4] == ZST_MAGIC:
        content = _zst_decompress(content, None)
    dict_id: int | None = None
    if content[:4] == _ZDICT_MAGIC:
        dict_id = int.from_bytes(content[4:8], "little")
    return content, dict_id


def _zst_decompress(
    frame: bytes, content_size: int | None, dict_bytes: bytes | None = None
) -> bytes:
    """Decompress one complete zstd frame; ``zstandard`` if installed,
    else pyarrow's bundled zstd codec.  Dictionary decode is
    ``zstandard``-only and fails LOUDLY when the package is absent."""
    try:
        import zstandard

        kw = {}
        if dict_bytes is not None:
            kw["dict_data"] = zstandard.ZstdCompressionDict(dict_bytes)
        return zstandard.ZstdDecompressor(**kw).decompress(
            frame, max_output_size=content_size or 1 << 31
        )
    except ImportError:
        pass
    if dict_bytes is not None:
        # No zstandard package: the from-spec pure-Python decoder
        # (sources/zstd_py.py, RFC 8878 incl. dictionary entropy tables
        # + window prefill) serves dictionary frames.  Slower than C,
        # but dictionary frames are the point-fetch/member tier, not
        # the bulk path — and the alternative was a hard failure.
        from h2h_spark.sources.zstd_py import decompress as _py_decompress

        return _py_decompress(frame, dict_data=dict_bytes)
    import pyarrow as pa

    if content_size is not None:
        return bytes(pa.Codec("zstd").decompress(frame, content_size))
    out = bytearray()
    stream = pa.CompressedInputStream(pa.BufferReader(frame), "zstd")
    while True:
        chunk = stream.read(_CHUNK)
        if not chunk:
            return bytes(out)
        out += chunk


def _zst_probe_plain(
    frame_prefix: bytes, probe_plain: int, dict_bytes: bytes | None = None
) -> bytes:
    """Best-effort decompress of up to ``probe_plain`` plaintext bytes
    from a (possibly truncated) compressed window at a frame start.
    An empty return means "reject the candidate".  With a dictionary
    and no ``zstandard`` package, the pure-Python decoder
    (``zstd_py.decompress_frame``) needs the COMPLETE frame — it has
    no streaming mode — so callers must pass the full frame bytes in
    that configuration (``ZstMemberScanner._validate`` un-caps the
    prefix read for exactly this case); a truncated window then maps
    to an empty probe, same contract as the zstandard branch."""
    try:
        import zstandard

        kw = {}
        if dict_bytes is not None:
            kw["dict_data"] = zstandard.ZstdCompressionDict(dict_bytes)
        d = zstandard.ZstdDecompressor(**kw).decompressobj()
        try:
            return d.decompress(frame_prefix)[:probe_plain]
        except zstandard.ZstdError:
            return b""
    except ImportError:
        pass
    if dict_bytes is not None:
        # Pure-Python dictionary probe: decode the (possibly truncated)
        # window; any format error just means "not enough bytes" — an
        # empty probe, same contract as the zstandard branch.
        from h2h_spark.sources.zstd_py import ZstdDict, ZstdFormatError
        from h2h_spark.sources.zstd_py import decompress_frame as _py_frame

        try:
            plain, _ = _py_frame(frame_prefix, 0, ZstdDict(dict_bytes))
            return plain[:probe_plain]
        except (ZstdFormatError, IndexError, struct.error):
            return b""
    import pyarrow as pa

    out = bytearray()
    try:
        stream = pa.CompressedInputStream(
            pa.BufferReader(frame_prefix), "zstd"
        )
        while len(out) < probe_plain:
            chunk = stream.read(min(4096, probe_plain - len(out)))
            if not chunk:
                break
            out += chunk
    except (OSError, pa.ArrowInvalid):
        # window ends mid-frame after yielding some plaintext — keep it
        pass
    return bytes(out)


class ZstMemberScanner:
    """Stream ``(offset, plaintext)`` for every zstd frame whose start
    lies in ``[start, end)`` — the zstd twin of ``GzMemberScanner``.

    Candidates are magic hits in the raw range; validation is (a) the
    structural block-header walk (``zst_frame_len``) and (b) the
    format predicate over a decompressed probe window.  Ownership by
    frame start offset; the frame body may extend past the range end
    (read-past-range, never double-emitted).  Memory per task is
    O(one member + chunk).

    Dictionary-compressed members (IIPC .warc.zst draft): a frame that
    declares a Dictionary_ID triggers ONE head-of-file read of the
    leading dictionary skippable frame (footer-read-sized, cached for
    the task); the id is cross-checked against the dictionary's own
    embedded id.  Decode against a dictionary requires ``zstandard``
    and fails loudly (never silently drops records) when absent."""

    def __init__(
        self,
        path: str,
        start: int,
        end: int,
        validate: Callable[[bytes], bool],
        probe_plain: int = 256,
    ):
        self.path = path
        self.size = file_size(path)
        self.start = start
        self.end = end
        self.validate = validate
        self.probe_plain = probe_plain
        self._dict: tuple[bytes | None, int | None] | None = None  # lazy

    def _dict_for(self, dict_id: int) -> bytes | None:
        """Dictionary bytes for a frame declaring ``dict_id`` (0 = no
        dictionary).  Loud on a missing or mismatched dictionary."""
        if not dict_id:
            return None
        if self._dict is None:
            self._dict = read_zst_dictionary(self.path)
        db, embedded = self._dict
        if db is None:
            raise ValueError(
                f"{self.path}: zstd frame declares dictionary id "
                f"{dict_id} but the file has no leading dictionary "
                f"skippable frame (magic 0x184D2A5D)"
            )
        if embedded is not None and embedded != dict_id:
            raise ValueError(
                f"{self.path}: zstd frame declares dictionary id "
                f"{dict_id} but the file's dictionary has id {embedded}"
            )
        return db

    def _validate(self, f, pos: int) -> int | None:
        """Return the frame length if ``pos`` starts a real member."""
        try:
            flen, _, dict_id = zst_frame_info(f, pos, self.size)
        except ZstFrameError:
            return None
        try:
            dict_bytes = self._dict_for(dict_id)
        except ValueError:
            # a CANDIDATE declaring a dictionary the file doesn't carry
            # (or a mismatched id) is a false magic hit — reject it; the
            # authoritative members() walk stays loud on real frames
            return None
        f.seek(pos)
        cap = min(flen, _PROBE_COMPRESSED_CAP)
        if dict_bytes is not None and flen > cap and not _have_zstandard():
            # The pure-Python dictionary decoder needs the COMPLETE
            # frame (zstd_py has no streaming mode); a capped prefix
            # would map every genuine dictionary member larger than
            # the cap to an empty probe and silently DROP it at
            # resync.  flen is already known from the structural walk,
            # so read the whole frame — same bytes members() reads
            # moments later for the accepted candidate.
            cap = flen
        prefix = f.read(cap)
        plain = _zst_probe_plain(prefix, self.probe_plain, dict_bytes)
        if plain and self.validate(plain):
            return flen
        return None

    def _align(self, f) -> int | None:
        if self.start == 0:
            return 0
        pos = self.start
        buf = b""
        buf_at = pos
        while True:
            if not buf:
                f.seek(buf_at)
                buf = f.read(_CHUNK)
                if not buf:
                    return None
            idx = buf.find(ZST_MAGIC)
            if idx < 0:
                if buf_at + len(buf) - 3 >= self.end:
                    return None
                buf_at += len(buf) - 3
                buf = buf[-3:]
                # _validate moved the file position; re-seek (same desync
                # hazard as the gzip aligner above).
                f.seek(buf_at + len(buf))
                nxt = f.read(_CHUNK)
                if not nxt:
                    return None
                buf += nxt
                continue
            cand = buf_at + idx
            if cand >= self.end:
                return None
            if self._validate(f, cand) is not None:
                return cand
            buf = buf[idx + 1:]
            buf_at = cand + 1

    def members(self) -> Iterator[tuple[int, bytes]]:
        with open_input(self.path) as f:
            pos = self._align(f)
            if pos is None:
                return
            while pos < self.end and pos < self.size:
                # step over skippable frames (magic 0x184D2A5x; metadata
                # sidecars carry no records) — they may open the file or
                # sit between data frames
                f.seek(pos)
                head = f.read(8)
                if len(head) >= 8:
                    magic = int.from_bytes(head[:4], "little")
                    if _ZST_SKIPPABLE_LO <= magic <= _ZST_SKIPPABLE_HI:
                        pos += 8 + int.from_bytes(head[4:8], "little")
                        continue
                flen, content_size, dict_id = zst_frame_info(
                    f, pos, self.size
                )
                dict_bytes = self._dict_for(dict_id)
                f.seek(pos)
                frame = f.read(flen)
                yield pos, _zst_decompress(frame, content_size, dict_bytes)
                pos += flen


def detect_zst_member_layout(path: str) -> str:
    """``"member"`` iff the first zstd frame ends before the file does.
    Skippable frames at the head are stepped over (they carry no data)."""
    size = file_size(path)
    with open_input(path) as f:
        pos = 0
        while pos + 8 <= size:
            f.seek(pos)
            magic = int.from_bytes(f.read(4), "little")
            if _ZST_SKIPPABLE_LO <= magic <= _ZST_SKIPPABLE_HI:
                pos += 8 + int.from_bytes(f.read(4), "little")
                continue
            try:
                flen, _ = zst_frame_len(f, pos, size)
            except ZstFrameError:
                return "stream"
            return "member" if pos + flen < size else "stream"
    return "stream"
