"""Splittable bzip2 — bit-aligned block resync + single-block
re-framing for the stdlib decoder.

bzip2 has no footer index, but every ~100-900 KB block begins with a
48-bit magic (``0x314159265359``, pi) at an ARBITRARY BIT offset, and
the stream ends with a 48-bit end marker (``0x177245385090``, sqrt
pi) — the public format every splittable-bzip2 reader (Hadoop,
commons-compress, indexed_bzip2) resyncs on.  Python's ``bz2`` can
only decode whole streams, so each block is decoded by REFRAMING it
as a one-block stream: ``BZh9`` header + the block's bits (shifted to
byte alignment) + the end marker + the stream-combined CRC, which for
a single block equals the block's own CRC (the 32 bits right after
its magic).  The header level byte is ALWAYS ``9``: it only declares
the decoder's maximum block size (level × 100 kB), so the maximum
accepts blocks from a stream written at any level — which makes
multi-stream concatenations with mixed levels (``cat a.bz2 b.bz2``,
pbzip2 output) decode correctly without tracking per-stream headers
(verified by ``test_bz2blocks.py::test_multistream_mixed_levels``).
The stdlib decoder then verifies the CRC — so a resync false positive
(a magic pattern inside compressed data, 2^-48 per bit) is caught by
decode failure and the scanner retries with the extent widened to the
next candidate, never emitting garbage.  A start candidate that is
bit-contiguous with a previously VERIFIED block end (or that starts
the stream following a verified end-of-stream marker) is guaranteed
real, so decode failure there is corruption and raises
``Bz2FormatError`` loudly instead of being skipped as a false
positive.

Split ownership follows the engine's byte-range contract: a task owns
the blocks whose magic's BIT offset lies inside its compressed byte
range × 8.  Line-oriented reads use Hadoop text-split semantics on
the decoded stream: every task but the first drops through the first
newline of its output, and every task reads exactly one line past its
last owned block — each line lands in exactly one task.
"""

from __future__ import annotations

from typing import Iterator

BZ2_BLOCK_MAGIC = 0x314159265359
BZ2_EOS_MAGIC = 0x177245385090


class Bz2FormatError(ValueError):
    """Malformed bzip2 container (always loud)."""


def _find_bit_magics(data: bytes, magic: int, nbits: int = 48) -> list[int]:
    """All BIT offsets where ``magic`` occurs — numpy-shifted byte
    search (8 shifted copies, bytes-level ``find``), not a per-bit
    Python loop."""
    import numpy as np

    if len(data) < (nbits + 7) // 8:
        return []
    a = np.frombuffer(data, np.uint8)
    hits: list[int] = []
    mb = magic.to_bytes(nbits // 8, "big")
    for shift in range(8):
        if shift == 0:
            s = data
        else:
            # byte stream as seen when skipping `shift` leading bits
            s = ((a[:-1].astype(np.uint16) << shift
                  | a[1:].astype(np.uint16) >> (8 - shift))
                 & 0xFF).astype(np.uint8).tobytes()
        at = s.find(mb)
        while at >= 0:
            hits.append(at * 8 + shift)
            at = s.find(mb, at + 1)
    hits.sort()
    return hits


def _bits_range(data: bytes, start: int, end: int) -> tuple[int, int]:
    """Bits ``[start, end)`` of the MSB-first stream as (value, nbits)."""
    bs, be = start // 8, (end + 7) // 8
    v = int.from_bytes(data[bs:be], "big")
    total = (be - bs) * 8
    lead = start - bs * 8
    trail = total - lead - (end - start)
    v &= (1 << (total - lead)) - 1
    v >>= trail
    return v, end - start


def parse_bz2_blocks(path: str) -> tuple[int, list[int], list[int]]:
    """One pass over the compressed bytes: returns ``(level_byte,
    block-start candidates, block-end candidates)`` — both BIT
    offsets.  Starts are block-magic hits; ends are block magics AND
    end-of-stream magics (a block runs to the next block, or to its
    stream's EOS — multi-stream concatenation, e.g. pbzip2 output, is
    just more starts after an EOS).  All candidates are verified at
    decode time (see module docstring)."""
    from h2h_spark.sources.util import open_input, strip_scheme

    with open_input(strip_scheme(path)) as f:
        data = f.read()
    return parse_bz2_data(data, path)


def parse_bz2_data(data: bytes, origin: str) -> tuple[int, list[int], list[int]]:
    if data[:3] != b"BZh" or not (0x31 <= data[3] <= 0x39):
        raise Bz2FormatError(f"{origin}: not a bzip2 stream")
    starts = [h for h in _find_bit_magics(data, BZ2_BLOCK_MAGIC)
              if h >= 32]
    if not starts or starts[0] != 32:
        raise Bz2FormatError(
            f"{origin}: first bzip2 block magic not at bit 32"
        )
    eos = _find_bit_magics(data, BZ2_EOS_MAGIC)
    ends = sorted(set(starts) | set(eos))
    return data[3], starts, ends


def _reframe_block(data: bytes, start_bit: int, end_bit: int) -> bytes:
    """A valid one-block bzip2 stream from block bits
    ``[start_bit, end_bit)`` — ``BZh9`` header + bits + EOS + combined
    CRC.  Level 9 (the maximum declared block size) accepts blocks
    written at any level — see module docstring."""
    blk, nbits = _bits_range(data, start_bit, end_bit)
    crc, _ = _bits_range(data, start_bit + 48, start_bit + 80)
    acc = int.from_bytes(b"BZh9", "big")
    bits = 32
    acc = (acc << nbits) | blk
    bits += nbits
    acc = (acc << 48) | BZ2_EOS_MAGIC
    bits += 48
    acc = (acc << 32) | crc  # single-block combined CRC == block CRC
    bits += 32
    pad = -bits % 8
    acc <<= pad
    bits += pad
    return acc.to_bytes(bits // 8, "big")


import bisect


def iter_bz2_block_bytes(
    data: bytes, starts: list[int], ends: list[int],
    idx: int, origin: str,
) -> tuple[bytes, int, int]:
    """Decode the block starting at ``starts[idx]``; returns
    ``(plaintext, next_idx, end_bit)`` — the index of the next real
    block's start candidate and this block's verified end bit.  A
    false-positive END candidate inside this block's data makes the
    truncated decode fail its CRC; the extent is then widened to the
    following candidate and retried."""
    import bz2 as _bz2

    start = starts[idx]
    j = bisect.bisect_right(ends, start)
    while True:
        if j >= len(ends):
            raise Bz2FormatError(
                f"{origin}: bzip2 block at bit {start} does not "
                "decode (corrupt block or truncated file)"
            )
        end = ends[j]
        try:
            out = _bz2.decompress(_reframe_block(data, start, end))
            return out, bisect.bisect_left(starts, end), end
        except OSError:
            j += 1  # candidate was a false positive inside this block


_WINDOW_PAD = 8 << 20      # initial read past the range end
_WINDOW_CAP = 256 << 20    # loud ceiling for pathological inputs


class _Bz2Window:
    """Byte window ``[base, base+len(buf))`` of one file, growable at
    the tail — a task reads its own range plus bounded read-past (a
    bzip2 block is <= ~1 MiB compressed), never the whole file."""

    def __init__(self, path: str, base: int, want_end: int):
        import os as _os

        from h2h_spark.sources.util import open_input, strip_scheme

        self.path = path
        self._p = strip_scheme(path)
        self.size = _os.path.getsize(self._p)
        self.base = base
        self._f = open_input(self._p)
        self._f.seek(base)
        self.buf = self._f.read(min(want_end, self.size) - base)
        # candidates are ABSOLUTE bit offsets
        self.starts = [
            base * 8 + h
            for h in _find_bit_magics(self.buf, BZ2_BLOCK_MAGIC)
        ]
        eos = [base * 8 + h for h in _find_bit_magics(self.buf, BZ2_EOS_MAGIC)]
        self.ends = sorted(set(self.starts) | set(eos))
        if base == 0:
            self.starts = [h for h in self.starts if h >= 32]
            self.ends = [h for h in self.ends if h >= 32]

    def at_eof(self) -> bool:
        return self.base + len(self.buf) >= self.size

    def grow(self) -> bool:
        """Extend the tail (doubling, capped); returns False at EOF."""
        if self.at_eof():
            return False
        if len(self.buf) >= _WINDOW_CAP:
            raise Bz2FormatError(
                f"{self.path}: bzip2 read-past window exceeded "
                f"{_WINDOW_CAP} bytes without completing a block/line"
            )
        add = self._f.read(max(len(self.buf), _WINDOW_PAD))
        if not add:
            return False
        # rescan only the appended region (6-byte back-overlap for
        # magics straddling the seam)
        seam = max(0, len(self.buf) - 6)
        region = self.buf[seam:] + add
        for h in _find_bit_magics(region, BZ2_BLOCK_MAGIC):
            a = (self.base + seam) * 8 + h
            if a not in self.starts and a >= 32:
                self.starts.append(a)
        import bisect as _b

        new_ends = set(self.ends)
        for h in _find_bit_magics(region, BZ2_EOS_MAGIC):
            a = (self.base + seam) * 8 + h
            if a >= 32:
                new_ends.add(a)
        self.starts = sorted(set(self.starts))
        new_ends.update(self.starts)
        self.ends = sorted(new_ends)
        self.buf += add
        del _b
        return True

    def bits(self, start: int, end: int) -> tuple[int, int]:
        """Absolute-bit-range view into the window."""
        rel_s = start - self.base * 8
        rel_e = end - self.base * 8
        if rel_s < 0 or rel_e > len(self.buf) * 8:
            raise Bz2FormatError(
                f"{self.path}: bit range outside window"
            )
        return _bits_range(self.buf, rel_s, rel_e)

    def close(self) -> None:
        self._f.close()


def _decode_block(win: _Bz2Window, idx: int) -> tuple[bytes, int, int]:
    """Decode the real block at ``win.starts[idx]``, growing the
    window when the extent runs off its tail; returns
    ``(plaintext, next_idx, end_bit)`` where ``end_bit`` is the
    VERIFIED end of this block (the next real block magic or EOS)."""
    import bz2 as _bz2

    start = win.starts[idx]
    j = bisect.bisect_right(win.ends, start)
    while True:
        if j >= len(win.ends):
            if win.grow():
                j = bisect.bisect_right(win.ends, start)
                # skip candidates already tried: recompute from the
                # first end we have not attempted — simplest correct
                # move is to retry all (decode cost dwarfs retries)
                continue
            raise Bz2FormatError(
                f"{win.path}: bzip2 block at bit {start} does not "
                "decode (corrupt block or truncated file)"
            )
        end = win.ends[j]
        blk, nbits = win.bits(start, end)
        crc, _ = win.bits(start + 48, start + 80)
        acc = int.from_bytes(b"BZh9", "big")
        acc = (((acc << nbits) | blk) << 48) | BZ2_EOS_MAGIC
        acc = (acc << 32) | crc
        bits = 32 + nbits + 48 + 32
        acc <<= -bits % 8
        framed = acc.to_bytes((bits + (-bits % 8)) // 8, "big")
        try:
            out = _bz2.decompress(framed)
            return out, bisect.bisect_left(win.starts, end), end
        except OSError:
            j += 1  # false-positive end candidate inside the block


def bz2_block_lines(
    path: str, start_byte: int, end_byte: int
) -> Iterator[bytes]:
    """Hadoop text-split semantics over the decoded stream: lines of
    the blocks whose magic BIT offset lies in
    ``[start_byte*8, end_byte*8)``; every task but the first drops
    through the first newline, every task reads one line past its
    last owned block.  IO per task is its own byte range plus bounded
    read-past — never the whole file."""
    from h2h_spark.sources.util import open_input, strip_scheme

    with open_input(strip_scheme(path)) as f:
        head = f.read(4)
    if head[:3] != b"BZh" or not (0x31 <= head[3] <= 0x39):
        raise Bz2FormatError(f"{path}: not a bzip2 stream")
    win = _Bz2Window(path, start_byte, end_byte + _WINDOW_PAD)
    lo_bit, hi_bit = start_byte * 8, end_byte * 8
    first = None
    for i, h in enumerate(win.starts):
        if lo_bit <= h < hi_bit:
            first = i
            break
    if first is None:
        win.close()
        return

    def real_blocks(i0: int) -> Iterator[tuple[int, bytes]]:
        """(start_bit, plaintext) for REAL blocks from candidate i0 on;
        a candidate that decodes against no extent is a false positive
        (2^-48 per bit) and is skipped — unless it is GUARANTEED real:
        the file's first block (bit 32), a candidate bit-contiguous
        with a previously verified block end, or the first block of a
        stream whose ``BZh`` header directly follows a verified
        end-of-stream marker.  Failure on a guaranteed-real block is
        corruption and stays loud."""
        guaranteed: set[int] = set()
        i = i0
        while i < len(win.starts):
            start = win.starts[i]
            try:
                out, nxt, end = _decode_block(win, i)
            except Bz2FormatError:
                if start == 32 or start in guaranteed:
                    raise
                i += 1
                continue
            # the thing at the verified end is real: either the next
            # block's magic (contiguous), or an EOS — in which case the
            # next stream's first block (header byte-aligned after
            # EOS + 32-bit stream CRC + padding) is real if present.
            if nxt < len(win.starts) and win.starts[nxt] == end:
                guaranteed.add(end)
            else:
                hdr_byte = (end + 80 + 7) // 8
                rel = hdr_byte - win.base
                if (0 <= rel and rel + 4 <= len(win.buf)
                        and win.buf[rel:rel + 3] == b"BZh"
                        and 0x31 <= win.buf[rel + 3] <= 0x39):
                    guaranteed.add(hdr_byte * 8 + 32)
            yield start, out
            i = nxt
            if i >= len(win.starts) and not win.at_eof():
                win.grow()

    first_bit = win.starts[first]
    it = real_blocks(first)
    boundary = 0        # decoded length of the OWNED blocks pulled
    boundary_final = False

    def pull() -> bytes | None:
        nonlocal boundary, boundary_final
        nxt = next(it, None)
        if nxt is None:
            boundary_final = True
            return None
        s, out = nxt
        if s < hi_bit:
            boundary += len(out)
        else:
            boundary_final = True
        return out

    buf = b""
    pos = 0             # decoded-stream offset of buf[0]
    if first_bit != 32:
        # not the file's first block: drop through the first newline
        # (those bytes belong to the previous task's read-past line)
        while True:
            chunk = pull()
            if chunk is None:
                return
            nl = chunk.find(b"\n")
            if nl >= 0:
                pos += nl + 1
                buf = chunk[nl + 1:]
                break
            pos += len(chunk)
    # emit lines while they START at or before the owned boundary —
    # the line starting exactly at the boundary is ours, and the next
    # task's first-newline drop skips exactly that line.  Chunk-batched
    # splitting: one split() per decoded block, never a per-line
    # re-slice (quadratic in block size).
    leftover = buf
    while True:
        parts = leftover.split(b"\n")
        leftover = parts.pop()
        for ln in parts:
            if boundary_final and pos > boundary:
                return
            yield ln
            pos += len(ln) + 1
        if boundary_final and pos > boundary:
            return
        chunk = pull()
        if chunk is None:
            if leftover and pos <= boundary:
                yield leftover
            return
        leftover += chunk
