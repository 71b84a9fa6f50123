"""LZ4 Frame format (lz4.org frame spec v1.6.x, magic 0x184D2204):
structural walk, pure-Python decode, and a splittable member scanner.

Role in the engine: the LZ4 twin of the zstd member tier
(`gzscan.ZstMemberScanner`).  Data-lake exports and log shippers emit
``.jsonl.lz4`` / ``.warc.lz4`` shards as CONCATENATED frames (one
frame per record batch); because every frame header carries enough to
walk its blocks structurally, a byte-range task can resync to the
next frame boundary and own every frame starting in its range — the
same split discipline as gzip members, zstd frames, and the
reference's record-aligned FLAT ranges (libhdfsconnector.cpp:76-96).

Decode strategy: block payloads are raw LZ4 blocks, decoded by the
round-tripped `meta._lz4_block_decompress` (validated against
pyarrow's lz4_raw compressor); frame plumbing here adds the header
checks, blockLinked window threading (matches may reach 64 KiB into
prior blocks), xxh32 block/content checksums, and skippable frames.
pyarrow's own "lz4" codec (libzstd's sibling in Arrow) serves as the
reference ENCODER in tests — every crafted case round-trips against
it.  All from the PUBLIC frame spec; no vendored library code.
"""

from __future__ import annotations

import struct
from typing import Callable, Iterator

from h2h_spark.sources.util import file_size, open_input

LZ4F_MAGIC = 0x184D2204
LZ4F_MAGIC_BYTES = b"\x04\x22\x4d\x18"
_SKIP_LO, _SKIP_HI = 0x184D2A50, 0x184D2A5F
_BLOCK_MAX = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}
_CHUNK = 1 << 20
_LINK_WINDOW = 1 << 16  # blockLinked lookback bound (spec: 64 KB)

_MASK32 = (1 << 32) - 1
_P1, _P2, _P3 = 2654435761, 2246822519, 3266489917
_P4, _P5 = 668265263, 374761393


class Lz4FrameError(ValueError):
    """Bytes do not form a valid LZ4 frame (loud, never tolerated)."""


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 (public algorithm) — LZ4 frame header/block/content
    checksums are all xxh32 (the header one keeps byte 1 of the hash)."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _MASK32
        v2 = (seed + _P2) & _MASK32
        v3 = seed
        v4 = (seed - _P1) & _MASK32
        lanes = struct.unpack_from(f"<{(n // 16) * 4}I", data)
        for j in range(0, len(lanes), 4):
            v1 = (_rotl32((v1 + lanes[j] * _P2) & _MASK32, 13) * _P1) & _MASK32
            v2 = (_rotl32((v2 + lanes[j + 1] * _P2) & _MASK32, 13) * _P1) & _MASK32
            v3 = (_rotl32((v3 + lanes[j + 2] * _P2) & _MASK32, 13) * _P1) & _MASK32
            v4 = (_rotl32((v4 + lanes[j + 3] * _P2) & _MASK32, 13) * _P1) & _MASK32
        i = (n // 16) * 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7)
             + _rotl32(v3, 12) + _rotl32(v4, 18)) & _MASK32
    else:
        h = (seed + _P5) & _MASK32
    h = (h + n) & _MASK32
    while i + 4 <= n:
        h = (h + struct.unpack_from("<I", data, i)[0] * _P3) & _MASK32
        h = (_rotl32(h, 17) * _P4) & _MASK32
        i += 4
    while i < n:
        h = (h + data[i] * _P5) & _MASK32
        h = (_rotl32(h, 11) * _P1) & _MASK32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _MASK32
    h ^= h >> 13
    h = (h * _P3) & _MASK32
    h ^= h >> 16
    return h


def parse_lz4f_header(data: bytes, pos: int = 0) -> dict:
    """Parse one frame header at ``pos``: returns dict with
    ``hdr_len block_indep block_checksum content_checksum content_size
    block_max``.  Verifies the spec's HC byte (second byte of
    xxh32 over the descriptor) — a cheap structural gate that makes
    false magic hits vanishingly unlikely during resync."""
    if len(data) < pos + 7:
        raise Lz4FrameError("truncated LZ4 frame header")
    if struct.unpack_from("<I", data, pos)[0] != LZ4F_MAGIC:
        raise Lz4FrameError(f"no LZ4 frame magic at offset {pos}")
    flg = data[pos + 4]
    bd = data[pos + 5]
    if flg >> 6 != 0b01:
        raise Lz4FrameError(f"unsupported LZ4 frame version {flg >> 6}")
    if flg & 0b10:
        raise Lz4FrameError("reserved FLG bit set")
    if bd & 0b10001111:
        raise Lz4FrameError("reserved BD bits set")
    bmax_id = (bd >> 4) & 7
    if bmax_id not in _BLOCK_MAX:
        raise Lz4FrameError(f"invalid block-max-size id {bmax_id}")
    has_csize = bool(flg & 0b1000)
    has_dictid = bool(flg & 0b1)
    p = pos + 6
    content_size = None
    if has_csize:
        if len(data) < p + 8:
            raise Lz4FrameError("truncated content-size field")
        content_size = struct.unpack_from("<Q", data, p)[0]
        p += 8
    if has_dictid:
        # external-dictionary frames: out of scope for the member tier
        # (no producer here emits them); loud, never misread
        raise Lz4FrameError("LZ4 frame declares a DictID (unsupported)")
    if len(data) < p + 1:
        raise Lz4FrameError("truncated header-checksum byte")
    hc = data[p]
    want = (xxh32(bytes(data[pos + 4:p])) >> 8) & 0xFF
    if hc != want:
        raise Lz4FrameError(
            f"header checksum mismatch at {pos}: got {hc:#x}, "
            f"computed {want:#x}"
        )
    return {
        "hdr_len": p + 1 - pos,
        "block_indep": bool(flg & 0b100000),
        "block_checksum": bool(flg & 0b10000),
        "content_checksum": bool(flg & 0b100),
        "content_size": content_size,
        "block_max": _BLOCK_MAX[bmax_id],
    }


def lz4f_frame_len(f, pos: int, size: int) -> tuple[int, int | None]:
    """Structural frame walk WITHOUT decompressing: seek/read only the
    header and each 4-byte block-size word.  Returns (frame_len,
    content_size|None).  This is the split planner's validator — the
    LZ4 twin of ``gzscan.zst_frame_len``."""
    f.seek(pos)
    head = f.read(19)  # magic+FLG+BD+maxcsize(8)+HC fits in 15; slack
    hdr = parse_lz4f_header(head, 0)
    p = pos + hdr["hdr_len"]
    bcs = 4 if hdr["block_checksum"] else 0
    while True:
        if p + 4 > size:
            raise Lz4FrameError(f"frame at {pos} truncated (block size)")
        f.seek(p)
        word = struct.unpack("<I", f.read(4))[0]
        p += 4
        if word == 0:  # EndMark
            break
        blen = word & 0x7FFFFFFF
        if blen > hdr["block_max"]:
            raise Lz4FrameError(
                f"block of {blen} bytes exceeds frame's declared max "
                f"{hdr['block_max']}"
            )
        p += blen + bcs
        if p > size:
            raise Lz4FrameError(f"frame at {pos} truncated (block body)")
    if hdr["content_checksum"]:
        p += 4
        if p > size:
            raise Lz4FrameError(f"frame at {pos} truncated (checksum)")
    return p - pos, hdr["content_size"]


def decompress_lz4f_frame(
    data: bytes, pos: int = 0, verify_checksums: bool = True
) -> tuple[bytes, int]:
    """Decode ONE frame at ``pos``: returns (plaintext, consumed).
    blockLinked frames thread the trailing 64 KiB of produced output
    into each block's match window."""
    from h2h_spark.sources.meta import _lz4_block_decompress

    hdr = parse_lz4f_header(data, pos)
    p = pos + hdr["hdr_len"]
    out = bytearray()
    while True:
        if p + 4 > len(data):
            raise Lz4FrameError("truncated block-size word")
        word = struct.unpack_from("<I", data, p)[0]
        p += 4
        if word == 0:
            break
        blen = word & 0x7FFFFFFF
        stored = bool(word & 0x80000000)
        if blen > hdr["block_max"]:
            raise Lz4FrameError("block exceeds declared max size")
        raw = bytes(data[p:p + blen])
        if len(raw) < blen:
            raise Lz4FrameError("truncated block body")
        p += blen
        if hdr["block_checksum"]:
            if p + 4 > len(data):
                raise Lz4FrameError("truncated block checksum")
            want = struct.unpack_from("<I", data, p)[0]
            p += 4
            if verify_checksums and xxh32(raw) != want:
                raise Lz4FrameError("block checksum mismatch")
        if stored:
            out += raw
        else:
            window = (b"" if hdr["block_indep"]
                      else bytes(out[-_LINK_WINDOW:]))
            try:
                out += _lz4_block_decompress(raw, "lz4-frame", window)
            except ValueError as e:
                raise Lz4FrameError(str(e)) from None
    if hdr["content_checksum"]:
        if p + 4 > len(data):
            raise Lz4FrameError("truncated content checksum")
        want = struct.unpack_from("<I", data, p)[0]
        p += 4
        if verify_checksums and xxh32(bytes(out)) != want:
            raise Lz4FrameError("content checksum mismatch")
    if (hdr["content_size"] is not None
            and len(out) != hdr["content_size"]):
        raise Lz4FrameError(
            f"content size {hdr['content_size']} != decoded {len(out)}"
        )
    return bytes(out), p - pos


def decompress_lz4(data: bytes, verify_checksums: bool = True) -> bytes:
    """Decode concatenated LZ4 frames (skippable frames skipped)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        if len(data) - pos < 8:
            raise Lz4FrameError(f"trailing garbage at offset {pos}")
        magic = struct.unpack_from("<I", data, pos)[0]
        if _SKIP_LO <= magic <= _SKIP_HI:
            ln = struct.unpack_from("<I", data, pos + 4)[0]
            if pos + 8 + ln > len(data):
                raise Lz4FrameError("skippable frame extends past buffer")
            pos += 8 + ln
            continue
        plain, used = decompress_lz4f_frame(data, pos, verify_checksums)
        out += plain
        pos += used
    return bytes(out)


class Lz4MemberScanner:
    """Stream ``(offset, plaintext)`` for every LZ4 frame starting in
    ``[start, end)`` — the LZ4 twin of ``gzscan.ZstMemberScanner``.

    Resync: scan the range for the frame magic, then validate the
    candidate structurally (header checksum byte + block-size walk,
    ``lz4f_frame_len``) and semantically (decode a probe, apply the
    caller's format predicate).  Ownership is by frame start offset;
    bodies may extend past the range end.  Memory O(member + chunk)."""

    def __init__(
        self,
        path: str,
        start: int,
        end: int,
        validate: Callable[[bytes], bool] = lambda b: True,
        probe_plain: int = 256,
    ):
        self.path = path
        self.size = file_size(path)
        self.start = start
        self.end = end
        self.validate = validate
        self.probe_plain = probe_plain

    def _validate(self, f, pos: int) -> int | None:
        try:
            flen, _ = lz4f_frame_len(f, pos, self.size)
        except Lz4FrameError:
            return None
        f.seek(pos)
        frame = f.read(flen)
        try:
            plain, _ = decompress_lz4f_frame(frame, 0)
        except Lz4FrameError:
            return None
        if self.validate(plain[:self.probe_plain]):
            return flen
        return None

    def _align(self, f) -> int | None:
        if self.start == 0:
            return 0
        buf = b""
        buf_at = self.start
        while True:
            if not buf:
                f.seek(buf_at)
                buf = f.read(_CHUNK)
                if not buf:
                    return None
            idx = buf.find(LZ4F_MAGIC_BYTES)
            if idx < 0:
                if buf_at + len(buf) - 3 >= self.end:
                    return None
                buf_at += len(buf) - 3
                buf = buf[-3:]
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
                f.seek(pos)
                head = f.read(8)
                if len(head) >= 8:
                    magic = int.from_bytes(head[:4], "little")
                    if _SKIP_LO <= magic <= _SKIP_HI:
                        pos += 8 + int.from_bytes(head[4:8], "little")
                        continue
                flen, _ = lz4f_frame_len(f, pos, self.size)
                f.seek(pos)
                frame = f.read(flen)
                plain, _ = decompress_lz4f_frame(frame, 0)
                yield pos, plain
                pos += flen


def detect_lz4_member_layout(path: str) -> str:
    """``"member"`` iff the first frame ends before the file does."""
    size = file_size(path)
    with open_input(path) as f:
        pos = 0
        while pos + 8 <= size:
            f.seek(pos)
            magic = int.from_bytes(f.read(4), "little")
            if _SKIP_LO <= magic <= _SKIP_HI:
                pos += 8 + int.from_bytes(f.read(4), "little")
                continue
            try:
                flen, _ = lz4f_frame_len(f, pos, size)
            except Lz4FrameError:
                return "stream"
            return "member" if pos + flen < size else "stream"
    return "stream"
