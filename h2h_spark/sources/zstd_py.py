"""Pure-Python zstd frame decoder (RFC 8878) with DICTIONARY support.

Why this exists: the engine's ``.warc.zst`` / ``.jsonl.zst`` scan tier
(`gzscan.py`) decodes plain frames through pyarrow's bundled zstd
codec, but pyarrow's API takes no dictionary — and the IIPC
``.warc.zst`` draft ships a leading skippable frame whose content is
an RFC 8878 structured dictionary that every data frame references.
Until now that path failed LOUD and asked for the optional
``zstandard`` package.  This module removes the cliff: a from-spec
decoder (frame header, raw/RLE/compressed blocks, FSE + Huffman
entropy, sequence execution with repcodes, dictionary entropy tables +
window prefill + repcode init, xxhash64 content checksum).

Scope and posture:

- DECODE only.  Correctness-first fallback: when ``zstandard`` is
  installed, `gzscan._zst_decompress` still prefers it (C speed); this
  module serves dictionary frames when it is absent.  Pure-Python
  throughput is ~1-5 MB/s on literal-heavy data — fine for the
  dictionary-frame role (point fetches, member scans of KiB-to-MiB
  frames), not a bulk path.
- LOUD on anything malformed: every deviation raises
  :class:`ZstdFormatError` with a byte offset, never silent garbage.
- Everything here derives from the PUBLIC RFC 8878 (and the spec's own
  pseudocode for the FSE count reader); no vendored library code.

Reference parity: the reference engine treats compressed transports as
stream codecs supplied by its host (gzip via libhdfs); dictionary zstd
is this repo's extension for crawl-corpus inputs (SURVEY §2 E-family).
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = 0xFD2FB528
DICT_MAGIC = 0xEC30A437
SKIP_MAGIC_LO = 0x184D2A50  # skippable frames: 0x184D2A50..5F

_MASK64 = (1 << 64) - 1


class ZstdFormatError(ValueError):
    """Malformed zstd input (never silently tolerated)."""


# ---------------------------------------------------------------------------
# bit readers
# ---------------------------------------------------------------------------


class _BackBits:
    """zstd backward bitstream: the LAST byte holds a 1-sentinel above
    the payload bits; reads proceed from just below the sentinel toward
    byte 0 (RFC 8878 §3.1.1.7)."""

    __slots__ = ("buf", "bits")

    def __init__(self, buf: bytes):
        if not buf:
            raise ZstdFormatError("empty backward bitstream")
        last = buf[-1]
        if last == 0:
            raise ZstdFormatError("backward bitstream missing sentinel bit")
        self.buf = buf
        self.bits = (len(buf) - 1) * 8 + last.bit_length() - 1

    def _extract(self, pos: int, n: int) -> int:
        if n == 0:
            return 0
        b0 = pos >> 3
        nbytes = ((pos & 7) + n + 7) >> 3
        chunk = int.from_bytes(self.buf[b0:b0 + nbytes], "little")
        return (chunk >> (pos & 7)) & ((1 << n) - 1)

    def read(self, n: int) -> int:
        """Strict read: overrunning the stream is corruption."""
        self.bits -= n
        if self.bits < 0:
            raise ZstdFormatError("backward bitstream overrun")
        return self._extract(self.bits, n)

    def read_pad(self, n: int) -> int:
        """Read that zero-pads past the start (FSE/HUF flush semantics:
        the final state transitions may consume short reads; the caller
        checks ``bits`` afterward to detect true overflow)."""
        self.bits -= n
        if self.bits >= 0:
            return self._extract(self.bits, n)
        avail = n + self.bits
        if avail <= 0:
            return 0
        return self._extract(0, avail) << (n - avail)


class _FwdBits:
    """Forward LSB-first bitstream (FSE table descriptions, §4.1.1)."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> int:
        p = self.pos
        b0 = p >> 3
        nbytes = ((p & 7) + n + 7) >> 3
        raw = self.buf[b0:b0 + nbytes]
        if len(raw) < nbytes:
            raise ZstdFormatError("forward bitstream overrun")
        chunk = int.from_bytes(raw, "little")
        self.pos = p + n
        return (chunk >> (p & 7)) & ((1 << n) - 1)

    def rewind(self, n: int) -> None:
        self.pos -= n

    def consumed_bytes(self) -> int:
        return (self.pos + 7) >> 3


# ---------------------------------------------------------------------------
# FSE
# ---------------------------------------------------------------------------


def _read_fse_counts(
    buf: bytes, max_log: int, max_symbols: int
) -> tuple[list[int], int, int]:
    """Parse an FSE table description: returns (normalized counts,
    accuracy_log, bytes consumed).  Algorithm is the RFC's own count
    reader (§4.1.1): variable-width values with a 1-bit-save low range,
    probability -1 allowed, 2-bit zero-repeat flags after a 0."""
    br = _FwdBits(buf)
    accuracy_log = br.read(4) + 5
    if accuracy_log > max_log:
        raise ZstdFormatError(
            f"FSE accuracy log {accuracy_log} exceeds max {max_log}"
        )
    remaining = 1 << accuracy_log
    counts: list[int] = []
    while remaining > 0 and len(counts) <= max_symbols:
        bits = (remaining + 1).bit_length()
        val = br.read(bits)
        low_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - (remaining + 1)
        if (val & low_mask) < threshold:
            br.rewind(1)
            val &= low_mask
        elif val > low_mask:
            val -= threshold
        proba = val - 1
        remaining -= -proba if proba < 0 else proba
        counts.append(proba)
        if proba == 0:
            while True:
                rep = br.read(2)
                counts.extend([0] * rep)
                if rep != 3:
                    break
    if remaining != 0:
        raise ZstdFormatError("FSE counts do not sum to table size")
    if len(counts) > max_symbols + 1:
        raise ZstdFormatError("FSE description has too many symbols")
    return counts, accuracy_log, br.consumed_bytes()


def _build_fse_table(
    counts: list[int], accuracy_log: int
) -> list[tuple[int, int, int]]:
    """Decoding table from normalized counts: entry[state] =
    (symbol, nb_bits, baseline) per §4.1.1's spread + state rules."""
    size = 1 << accuracy_log
    syms = [0] * size
    high = size - 1
    for s, c in enumerate(counts):
        if c == -1:
            syms[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, c in enumerate(counts):
        for _ in range(c if c > 0 else 0):
            syms[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ZstdFormatError("FSE spread did not return to position 0")
    nxt = [1 if c == -1 else c for c in counts]
    table: list[tuple[int, int, int]] = [None] * size  # type: ignore
    for state in range(size):
        s = syms[state]
        x = nxt[s]
        nxt[s] = x + 1
        nb = accuracy_log - (x.bit_length() - 1)
        table[state] = (s, nb, (x << nb) - size)
    return table


def _fse_decode_interleaved(
    table: list[tuple[int, int, int]], accuracy_log: int, buf: bytes,
    max_out: int,
) -> list[int]:
    """Two-state interleaved FSE stream (Huffman weights, §4.2.1):
    alternate states until the bitstream is exhausted, flushing the
    other state's pending symbol at overflow."""
    br = _BackBits(buf)
    s1 = br.read(accuracy_log)
    s2 = br.read(accuracy_log)
    out: list[int] = []
    while True:
        sym, nb, base = table[s1]
        out.append(sym)
        s1 = base + br.read_pad(nb)
        if br.bits < 0:
            out.append(table[s2][0])
            break
        sym, nb, base = table[s2]
        out.append(sym)
        s2 = base + br.read_pad(nb)
        if br.bits < 0:
            out.append(table[s1][0])
            break
        if len(out) > max_out:
            raise ZstdFormatError("FSE weight stream produced too many symbols")
    if len(out) > max_out:
        raise ZstdFormatError("FSE weight stream produced too many symbols")
    return out


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


def _build_huf_table(
    weights: list[int],
) -> tuple[list[tuple[int, int]], int]:
    """Canonical Huffman decode table from COMPLETE weights (§4.2.1):
    entry[peek] = (symbol, nb_bits); symbols fill the table low-to-high
    in increasing-weight order, natural symbol order within a weight."""
    total = 0
    for w in weights:
        if w > 0:
            total += 1 << (w - 1)
    if total == 0 or total & (total - 1):
        raise ZstdFormatError("Huffman weights do not sum to a power of 2")
    table_log = total.bit_length() - 1
    if table_log > 11:
        raise ZstdFormatError(f"Huffman table log {table_log} > 11")
    rank_start = [0] * (table_log + 2)
    pos = 0
    for w in range(1, table_log + 2):
        rank_start[w] = pos
        pos += sum(1 for x in weights if x == w) * (1 << (w - 1))
    table: list[tuple[int, int]] = [None] * (1 << table_log)  # type: ignore
    for s, w in enumerate(weights):
        if w == 0:
            continue
        n = 1 << (w - 1)
        nb = table_log + 1 - w
        start = rank_start[w]
        for i in range(start, start + n):
            table[i] = (s, nb)
        rank_start[w] = start + n
    return table, table_log


def _complete_weights(explicit: list[int]) -> list[int]:
    """Append the implicit last weight (§4.2.1: the last symbol's
    weight completes the sum to a power of two)."""
    total = 0
    for w in explicit:
        if w > 11:
            raise ZstdFormatError(f"Huffman weight {w} > 11")
        if w > 0:
            total += 1 << (w - 1)
    if total == 0:
        raise ZstdFormatError("Huffman weights are all zero")
    nextp = 1 << total.bit_length()
    missing = nextp - total
    if missing & (missing - 1):
        raise ZstdFormatError("Huffman weights leave a non-power-of-2 gap")
    return explicit + [missing.bit_length()]


def _parse_huf_desc(buf: bytes) -> tuple[list[tuple[int, int]], int, int]:
    """Huffman tree description (§4.2.1): direct 4-bit weights when the
    header byte is >= 128, else an FSE-compressed weight stream of that
    many bytes.  Returns (table, table_log, bytes consumed)."""
    if not buf:
        raise ZstdFormatError("empty Huffman description")
    hb = buf[0]
    if hb >= 128:
        n_weights = hb - 127
        nbytes = (n_weights + 1) // 2
        raw = buf[1:1 + nbytes]
        if len(raw) < nbytes:
            raise ZstdFormatError("truncated direct Huffman weights")
        explicit = []
        for i in range(n_weights):
            b = raw[i >> 1]
            explicit.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        consumed = 1 + nbytes
    else:
        csize = hb
        raw = buf[1:1 + csize]
        if len(raw) < csize:
            raise ZstdFormatError("truncated FSE Huffman weights")
        counts, al, hdr = _read_fse_counts(raw, 6, 255)
        table = _build_fse_table(counts, al)
        explicit = _fse_decode_interleaved(table, al, raw[hdr:], 255)
        consumed = 1 + csize
    weights = _complete_weights(explicit)
    if len(weights) > 256:
        raise ZstdFormatError("more than 256 Huffman symbols")
    htable, tlog = _build_huf_table(weights)
    return htable, tlog, consumed


def _huf_decode_stream(
    table: list[tuple[int, int]], table_log: int, buf: bytes, n_out: int
) -> bytearray:
    """One Huffman-coded stream, backward bits, peek-table_log decode
    (§4.2.1.6); the stream must end with exactly zero bits left."""
    br = _BackBits(buf)
    out = bytearray()
    bits = br.bits
    buf_ = br.buf
    extract = br._extract
    for _ in range(n_out):
        p = bits - table_log
        if p >= 0:
            idx = extract(p, table_log)
        else:
            avail = table_log + p
            if avail <= 0:
                raise ZstdFormatError("Huffman stream exhausted early")
            idx = extract(0, avail) << (table_log - avail)
        sym, nb = table[idx]
        out.append(sym)
        bits -= nb
        if bits < 0:
            raise ZstdFormatError("Huffman stream overrun")
    if bits != 0:
        raise ZstdFormatError(
            f"Huffman stream has {bits} leftover bits (must end exactly)"
        )
    return out


# ---------------------------------------------------------------------------
# sequences: code tables + defaults (§3.1.1.3.2)
# ---------------------------------------------------------------------------

_LL_BASE_BITS = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
    (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10),
    (2048, 11), (4096, 12), (8192, 13), (16384, 14), (32768, 15),
    (65536, 16),
]
_ML_BASE_BITS = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16),
]

_LL_DEFAULT = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
               2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
               -1, -1, -1, -1]
_ML_DEFAULT = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
               -1, -1, -1, -1, -1]
_OF_DEFAULT = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1]

_LL_DEFAULT_TABLE = _build_fse_table(_LL_DEFAULT, 6), 6
_ML_DEFAULT_TABLE = _build_fse_table(_ML_DEFAULT, 6), 6
_OF_DEFAULT_TABLE = _build_fse_table(_OF_DEFAULT, 5), 5

_MAX_AL = {"ll": 9, "of": 8, "ml": 9}
_MAX_SYM = {"ll": 35, "of": 31, "ml": 52}
_DEFAULTS = {"ll": _LL_DEFAULT_TABLE, "of": _OF_DEFAULT_TABLE,
             "ml": _ML_DEFAULT_TABLE}


def _read_seq_table(kind, mode, buf, pos, prev):
    """One of the three sequence tables per its 2-bit mode: predefined /
    RLE / FSE-description / repeat (§3.1.1.3.2.1)."""
    if mode == 0:
        return _DEFAULTS[kind], pos
    if mode == 1:  # RLE: single symbol, "table" with 0-bit transitions
        if pos >= len(buf):
            raise ZstdFormatError("truncated RLE sequence table")
        sym = buf[pos]
        if sym > _MAX_SYM[kind]:
            raise ZstdFormatError(
                f"RLE {kind} symbol {sym} > max {_MAX_SYM[kind]}"
            )
        return ([(sym, 0, 0)], 0), pos + 1
    if mode == 2:
        counts, al, used = _read_fse_counts(
            buf[pos:], _MAX_AL[kind], _MAX_SYM[kind]
        )
        return (_build_fse_table(counts, al), al), pos + used
    if prev is None:
        raise ZstdFormatError(
            f"{kind} table repeat mode with no previous table "
            "(no earlier block and no dictionary)"
        )
    return prev, pos


# ---------------------------------------------------------------------------
# xxhash64 (content checksum, public algorithm)
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK64
        v2 = (seed + _P2) & _MASK64
        v3 = seed
        v4 = (seed - _P1) & _MASK64
        lanes = struct.unpack_from(f"<{(n // 32) * 4}Q", data)
        for j in range(0, len(lanes), 4):
            v1 = (_rotl((v1 + lanes[j] * _P2) & _MASK64, 31) * _P1) & _MASK64
            v2 = (_rotl((v2 + lanes[j + 1] * _P2) & _MASK64, 31) * _P1) & _MASK64
            v3 = (_rotl((v3 + lanes[j + 2] * _P2) & _MASK64, 31) * _P1) & _MASK64
            v4 = (_rotl((v4 + lanes[j + 3] * _P2) & _MASK64, 31) * _P1) & _MASK64
        i = (n // 32) * 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK64
        for v in (v1, v2, v3, v4):
            h = ((h ^ (_rotl((v * _P2) & _MASK64, 31) * _P1) & _MASK64)
                 * _P1 + _P4) & _MASK64
    else:
        h = (seed + _P5) & _MASK64
    h = (h + n) & _MASK64
    while i + 8 <= n:
        k = struct.unpack_from("<Q", data, i)[0]
        h ^= (_rotl((k * _P2) & _MASK64, 31) * _P1) & _MASK64
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK64
        i += 8
    if i + 4 <= n:
        h ^= (struct.unpack_from("<I", data, i)[0] * _P1) & _MASK64
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK64
        h = (_rotl(h, 11) * _P1) & _MASK64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK64
    h ^= h >> 29
    h = (h * _P3) & _MASK64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# dictionary
# ---------------------------------------------------------------------------


class ZstdDict:
    """Parsed RFC 8878 §5 dictionary: entropy tables + content window +
    initial repcodes.  Raw-content dictionaries (no magic) carry only
    the window."""

    __slots__ = ("dict_id", "content", "huf", "huf_log",
                 "ll", "of", "ml", "repcodes")

    def __init__(self, data: bytes):
        self.huf = None
        self.huf_log = 0
        self.ll = self.of = self.ml = None
        self.repcodes = [1, 4, 8]
        if len(data) >= 8 and struct.unpack_from("<I", data)[0] == DICT_MAGIC:
            self.dict_id = struct.unpack_from("<I", data, 4)[0]
            pos = 8
            self.huf, self.huf_log, used = _parse_huf_desc(data[pos:])
            pos += used
            for kind in ("of", "ml", "ll"):  # spec order: OF, ML, LL
                counts, al, used = _read_fse_counts(
                    data[pos:], _MAX_AL[kind], _MAX_SYM[kind]
                )
                setattr(self, kind, (_build_fse_table(counts, al), al))
                pos += used
            if pos + 12 > len(data):
                raise ZstdFormatError("dictionary truncated before repcodes")
            self.repcodes = list(struct.unpack_from("<3I", data, pos))
            if any(r == 0 for r in self.repcodes):
                raise ZstdFormatError("dictionary repcode is zero")
            pos += 12
            self.content = data[pos:]
        else:
            self.dict_id = None
            self.content = data


# ---------------------------------------------------------------------------
# frame decode
# ---------------------------------------------------------------------------


def _parse_frame_header(data: bytes, pos: int):
    """Returns (header_len, window_hint, dict_id, content_size,
    has_checksum); content_size None when not declared."""
    if len(data) - pos < 6:
        raise ZstdFormatError(f"truncated frame header at {pos}")
    fhd = data[pos + 4]
    if fhd & 0x08:
        raise ZstdFormatError("reserved frame-header bit set")
    single = bool(fhd & 0x20)
    has_checksum = bool(fhd & 0x04)
    did_size = (0, 1, 2, 4)[fhd & 0x03]
    fcs_flag = fhd >> 6
    fcs_size = (1 if single else 0, 2, 4, 8)[fcs_flag]
    p = pos + 5
    window = None
    if not single:
        wd = data[p]
        exponent, mantissa = wd >> 3, wd & 7
        base = 1 << (10 + exponent)
        window = base + (base // 8) * mantissa
        p += 1
    dict_id = 0
    if did_size:
        if len(data) < p + did_size:
            raise ZstdFormatError("truncated dictionary id field")
        dict_id = int.from_bytes(data[p:p + did_size], "little")
        p += did_size
    content_size = None
    if fcs_size:
        if len(data) < p + fcs_size:
            raise ZstdFormatError("truncated frame content size")
        content_size = int.from_bytes(data[p:p + fcs_size], "little")
        if fcs_size == 2:
            content_size += 256
        p += fcs_size
    if single:
        window = content_size
    return p - pos, window, dict_id, content_size, has_checksum


def _decode_literals(block, pos, state):
    """Literals section (§3.1.1.3.1).  Returns (literals, new_pos)."""
    b0 = block[pos]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if sf in (0, 2):
            rs = b0 >> 3
            pos += 1
        elif sf == 1:
            rs = (b0 >> 4) | (block[pos + 1] << 4)
            pos += 2
        else:
            rs = (b0 >> 4) | (block[pos + 1] << 4) | (block[pos + 2] << 12)
            pos += 3
        if ltype == 0:
            lit = bytes(block[pos:pos + rs])
            if len(lit) < rs:
                raise ZstdFormatError("truncated raw literals")
            return lit, pos + rs
        return bytes([block[pos]]) * rs, pos + 1
    # Compressed (2) / Treeless (3)
    if sf == 0:
        rs = (b0 >> 4) | ((block[pos + 1] & 0x3F) << 4)
        cs = (block[pos + 1] >> 6) | (block[pos + 2] << 2)
        streams, pos = 1, pos + 3
    elif sf == 1:
        rs = (b0 >> 4) | ((block[pos + 1] & 0x3F) << 4)
        cs = (block[pos + 1] >> 6) | (block[pos + 2] << 2)
        streams, pos = 4, pos + 3
    elif sf == 2:
        rs = (b0 >> 4) | (block[pos + 1] << 4) | ((block[pos + 2] & 3) << 12)
        cs = (block[pos + 2] >> 2) | (block[pos + 3] << 6)
        streams, pos = 4, pos + 4
    else:
        rs = (b0 >> 4) | (block[pos + 1] << 4) | ((block[pos + 2] & 0x3F) << 12)
        cs = (block[pos + 2] >> 6) | (block[pos + 3] << 2) | (block[pos + 4] << 10)
        streams, pos = 4, pos + 5
    payload = block[pos:pos + cs]
    if len(payload) < cs:
        raise ZstdFormatError("truncated compressed literals")
    off = 0
    if ltype == 2:
        state["huf"], state["huf_log"], off = _parse_huf_desc(payload)
    elif state.get("huf") is None:
        raise ZstdFormatError(
            "treeless literals with no previous Huffman table "
            "(no earlier block and no dictionary)"
        )
    table, tlog = state["huf"], state["huf_log"]
    if streams == 1:
        lit = _huf_decode_stream(table, tlog, payload[off:], rs)
    else:
        if cs - off < 6:
            raise ZstdFormatError("4-stream literals too short for jump table")
        s1, s2, s3 = struct.unpack_from("<3H", payload, off)
        off += 6
        s4 = cs - off - s1 - s2 - s3
        if s4 <= 0:
            raise ZstdFormatError("4-stream jump table exceeds payload")
        r13 = (rs + 3) // 4
        r4 = rs - 3 * r13
        if r4 < 0:
            raise ZstdFormatError("regenerated size smaller than 3 streams")
        lit = bytearray()
        for sz, rn in ((s1, r13), (s2, r13), (s3, r13), (s4, r4)):
            lit += _huf_decode_stream(
                table, tlog, payload[off:off + sz], rn
            )
            off += sz
    if len(lit) != rs:
        raise ZstdFormatError("literals regenerated size mismatch")
    return bytes(lit), pos + cs


def _decode_block(block, out, state, window_lo):
    """One compressed block (§3.1.1.3): literals + sequences, executed
    against ``out`` (which already holds the dictionary prefix and all
    prior output).  ``window_lo`` is the lowest byte offset a match may
    reach (0 = dictionary start)."""
    literals, pos = _decode_literals(block, 0, state)
    if pos >= len(block):
        raise ZstdFormatError("block ends before sequences header")
    b0 = block[pos]
    if b0 == 0:
        n_seq = 0
        pos += 1
    elif b0 < 128:
        n_seq = b0
        pos += 1
    elif b0 < 255:
        n_seq = ((b0 - 128) << 8) + block[pos + 1]
        pos += 2
    else:
        n_seq = block[pos + 1] + (block[pos + 2] << 8) + 0x7F00
        pos += 3
    if n_seq == 0:
        out += literals
        return
    modes = block[pos]
    if modes & 3:
        raise ZstdFormatError("reserved sequence-mode bits set")
    pos += 1
    state["ll"], pos = _read_seq_table("ll", modes >> 6, block, pos,
                                       state.get("ll"))
    state["of"], pos = _read_seq_table("of", (modes >> 4) & 3, block, pos,
                                       state.get("of"))
    state["ml"], pos = _read_seq_table("ml", (modes >> 2) & 3, block, pos,
                                       state.get("ml"))
    (ll_t, ll_al), (of_t, of_al), (ml_t, ml_al) = (
        state["ll"], state["of"], state["ml"]
    )
    br = _BackBits(block[pos:])
    ll_s = br.read(ll_al)
    of_s = br.read(of_al)
    ml_s = br.read(ml_al)
    rep = state["rep"]
    lit_pos = 0
    for i in range(n_seq):
        of_code = of_t[of_s][0]
        if of_code > 31:
            raise ZstdFormatError(f"offset code {of_code} out of range")
        offset_value = (1 << of_code) + br.read(of_code)
        ml_code = ml_t[ml_s][0]
        ml_base, ml_bits = _ML_BASE_BITS[ml_code]
        match_len = ml_base + br.read(ml_bits)
        ll_code = ll_t[ll_s][0]
        ll_base, ll_bits = _LL_BASE_BITS[ll_code]
        lit_len = ll_base + br.read(ll_bits)
        # repcode resolution (§3.1.1.5)
        if offset_value > 3:
            offset = offset_value - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = offset_value - 1 + (1 if lit_len == 0 else 0)
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 2:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:
                offset = rep[0] - 1
                if offset == 0:
                    raise ZstdFormatError("repcode produced offset 0")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        if lit_len:
            out += literals[lit_pos:lit_pos + lit_len]
            lit_pos += lit_len
        start = len(out) - offset
        if start < window_lo:
            raise ZstdFormatError(
                f"match offset {offset} reaches before the window"
            )
        if offset >= match_len:
            out += out[start:start + match_len]
        else:
            for _ in range(match_len):  # overlapping (RLE-style) match
                out.append(out[start])
                start += 1
        if i + 1 < n_seq:  # §4.2.2: last sequence skips state updates
            sym, nb, base = ll_t[ll_s]
            ll_s = base + br.read(nb)
            sym, nb, base = ml_t[ml_s]
            ml_s = base + br.read(nb)
            sym, nb, base = of_t[of_s]
            of_s = base + br.read(nb)
    if br.bits != 0:
        raise ZstdFormatError(
            f"sequence bitstream has {br.bits} leftover bits"
        )
    out += literals[lit_pos:]


def decompress_frame(
    data: bytes, pos: int = 0, zdict: ZstdDict | None = None,
    verify_checksum: bool = True,
) -> tuple[bytes, int]:
    """Decode ONE zstd frame starting at ``pos``; returns
    (plaintext, bytes_consumed)."""
    if len(data) < pos + 4:
        raise ZstdFormatError(f"truncated frame at offset {pos}")
    magic = struct.unpack_from("<I", data, pos)[0]
    if magic != ZSTD_MAGIC:
        raise ZstdFormatError(f"no zstd magic at offset {pos}")
    hlen, _window, dict_id, content_size, has_checksum = (
        _parse_frame_header(data, pos)
    )
    if dict_id:
        if zdict is None:
            raise ZstdFormatError(
                f"frame declares dictionary id {dict_id} but no "
                "dictionary was provided"
            )
        if zdict.dict_id is not None and zdict.dict_id != dict_id:
            raise ZstdFormatError(
                f"frame wants dictionary {dict_id}, got {zdict.dict_id}"
            )
    p = pos + hlen
    # A provided dictionary applies even when the frame omits the id
    # (RFC 8878 §3.1.1.1.3: declaring it is optional) — matching
    # libzstd's usingDict behavior.
    if zdict is not None:
        out = bytearray(zdict.content)
        state = {
            "huf": zdict.huf, "huf_log": zdict.huf_log,
            "ll": zdict.ll, "of": zdict.of, "ml": zdict.ml,
            "rep": list(zdict.repcodes),
        }
    else:
        out = bytearray()
        state = {"huf": None, "huf_log": 0, "ll": None, "of": None,
                 "ml": None, "rep": [1, 4, 8]}
    produced_from = len(out)
    while True:
        if p + 3 > len(data):
            raise ZstdFormatError("truncated block header")
        bh = int.from_bytes(data[p:p + 3], "little")
        p += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:  # raw
            if p + bsize > len(data):
                raise ZstdFormatError("truncated raw block")
            out += data[p:p + bsize]
            p += bsize
        elif btype == 1:  # RLE
            if p >= len(data):
                raise ZstdFormatError("truncated RLE block")
            out += bytes([data[p]]) * bsize
            p += 1
        elif btype == 2:
            if p + bsize > len(data):
                raise ZstdFormatError("truncated compressed block")
            try:
                _decode_block(memoryview(data)[p:p + bsize], out, state, 0)
            except IndexError:
                raise ZstdFormatError(
                    f"block at offset {p} ends mid-structure"
                ) from None
            p += bsize
        else:
            raise ZstdFormatError("reserved block type 3")
        if last:
            break
    plain = bytes(out[produced_from:])
    if content_size is not None and len(plain) != content_size:
        raise ZstdFormatError(
            f"frame content size {content_size} != decoded {len(plain)}"
        )
    if has_checksum:
        if p + 4 > len(data):
            raise ZstdFormatError("truncated content checksum")
        want = struct.unpack_from("<I", data, p)[0]
        p += 4
        if verify_checksum and (xxh64(plain) & 0xFFFFFFFF) != want:
            raise ZstdFormatError("content checksum mismatch")
    return plain, p - pos


def decompress(
    data: bytes, dict_data: bytes | None = None,
    verify_checksum: bool = True,
) -> bytes:
    """Decode a buffer of concatenated zstd frames (skippable frames are
    skipped), with optional dictionary bytes (structured or raw)."""
    zdict = ZstdDict(dict_data) if dict_data is not None else None
    out = bytearray()
    pos = 0
    while pos < len(data):
        if len(data) - pos < 8:
            raise ZstdFormatError(f"trailing garbage at offset {pos}")
        magic = struct.unpack_from("<I", data, pos)[0]
        if magic & 0xFFFFFFF0 == SKIP_MAGIC_LO:
            ln = struct.unpack_from("<I", data, pos + 4)[0]
            if pos + 8 + ln > len(data):
                raise ZstdFormatError(
                    f"skippable frame at {pos} extends past the buffer"
                )
            pos += 8 + ln
            continue
        plain, used = decompress_frame(data, pos, zdict, verify_checksum)
        out += plain
        pos += used
    return bytes(out)
