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

import zlib
from typing import Callable, Iterator

from h2h_spark.sources.util import file_size, open_input

GZ_MAGIC = b"\x1f\x8b\x08"
_CHUNK = 1 << 20  # 1 MiB streaming read unit
_PROBE_COMPRESSED_CAP = 64 * 1024  # bound on compressed bytes per probe


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
        if codec not in ("bz2", "xz", "zst"):
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
            else:
                try:
                    import zstandard
                except ImportError as e:  # pragma: no cover - env-dependent
                    raise ImportError(
                        "reading .zst requires the 'zstandard' package, "
                        "which is not installed in this environment"
                    ) from e
                f = zstandard.ZstdDecompressor().stream_reader(raw)
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
