"""From-spec pure-Python LZO1X codec (decompressor + fixture encoder).

LZO1X is the block format the ORC ``LZO`` compression kind wraps
(reference parity: the reference engine delegates codec work to its
platform libraries; here the PUBLIC bitstream specification — the
Linux kernel's ``Documentation/lzo.txt`` and the liblzo2 algorithm
description — is implemented directly, in the same from-spec style as
``sources/zstd_py.py`` for RFC 8878).  No GPL code is used or linked:
this file implements the documented instruction encoding only.

Instruction summary (version-0 bitstream, the one every ORC writer
emits):

* first byte ``> 17``: copy ``b - 17`` literals; 1..3 of them put the
  decoder in the trailing-literal state (next instruction must be a
  match), 4+ in the long-literal state.
* ``0000LLLL``: long literal run — ``3 + L`` literals, ``L == 0``
  extends by ``15 + 255*zero_bytes + nonzero_byte``.  In the
  trailing-literal / long-literal states this opcode instead encodes
  the short M1 matches (2 bytes within 1 kB / 3 bytes at 2049..3072).
* ``0001HLLL`` (M4): match within 16..48 kB, LE16 operand; distance
  ``16384 + (H<<11)*... + (D>>2)``; zero distance marks END of stream.
* ``001LLLLL`` (M3): match within 16 kB, ``2 + L`` long (L == 0
  extends by ``31 + 255*zeros + nz``), LE16 operand, distance
  ``(D>>2) + 1``.
* ``01LDDDSS`` / ``1LLDDDSS`` (M2): 3..8-byte match within 2 kB, one
  trailing byte H, distance ``(H<<3) + D + 1``.
* every match operand's low 2 bits ``S`` copy 0..3 literals after the
  match; ``S != 0`` forces the NEXT instruction to be a match.

The encoder is the fixture/interop inverse: a greedy 16 kB-window
matcher that emits literal runs, M3 matches and the documented state
transitions — enough to round-trip any input and to build real ORC
LZO files for the oracle; ratio is not a goal.
"""

from __future__ import annotations


class Lzo1xError(ValueError):
    """Malformed or truncated LZO1X stream (always loud, never guesses)."""


def _copy_match(out: bytearray, dist: int, length: int, origin: str) -> None:
    start = len(out) - dist
    if start < 0:
        raise Lzo1xError(
            f"{origin}: LZO1X match distance {dist} reaches before "
            "output start"
        )
    # overlap-safe: each slice sees bytes appended by earlier iterations
    while length > 0:
        chunk = out[start:start + length]
        out += chunk
        length -= len(chunk)
        start += len(chunk)
        if not chunk:  # dist == 0 can't happen (dist >= 1 by encoding)
            raise Lzo1xError(f"{origin}: zero-length LZO1X match copy")


def lzo1x_decompress(src: bytes, origin: str = "lzo1x") -> bytes:
    """Decode one LZO1X compressed block.  The stream must end with the
    documented end-of-stream marker (``11 00 00``) and consume the
    input exactly; anything else raises :class:`Lzo1xError`."""
    n = len(src)
    ip = 0
    out = bytearray()

    def byte() -> int:
        nonlocal ip
        if ip >= n:
            raise Lzo1xError(f"{origin}: truncated LZO1X stream")
        b = src[ip]
        ip += 1
        return b

    def le16() -> int:
        nonlocal ip
        if ip + 2 > n:
            raise Lzo1xError(f"{origin}: truncated LZO1X LE16 operand")
        v = src[ip] | (src[ip + 1] << 8)
        ip += 2
        return v

    def run_ext(base: int) -> int:
        # length = base + 255*zero_bytes + nonzero_byte
        ext = 0
        while True:
            b = byte()
            if b == 0:
                ext += 255
                if ext > 1 << 24:
                    raise Lzo1xError(f"{origin}: runaway LZO1X run length")
            else:
                return base + ext + b

    def literals(count: int) -> None:
        nonlocal ip
        if ip + count > n:
            raise Lzo1xError(f"{origin}: literal run past stream end")
        out.extend(src[ip:ip + count])
        ip += count

    if n == 0:
        raise Lzo1xError(f"{origin}: empty LZO1X stream")

    t = 0  # pending trailing-literal count / state
    state = 0  # 0 = expect literal run or match; 4 = long-literal just ran
    first = src[0]
    if first > 17:
        ip = 1
        t = first - 17
        if t < 4:
            literals(t)
            state = t  # next instruction MUST be a match
        else:
            literals(t)
            state = 4

    while True:
        if state == 0:
            t = byte()
            if t < 16:
                # long literal run
                count = run_ext(15 + 3) if t == 0 else t + 3
                literals(count)
                state = 4
                continue
        else:
            t = byte()
            if t < 16:
                # M1 short matches, meaning depends on prior state
                if state == 4:
                    # 3 bytes from 2049..3072 back
                    h = byte()
                    dist = (t >> 2) + (h << 2) + 2049
                    _copy_match(out, dist, 3, origin)
                else:
                    # 2 bytes within 1 kB
                    h = byte()
                    dist = (t >> 2) + (h << 2) + 1
                    _copy_match(out, dist, 2, origin)
                s = t & 3
                literals(s)
                state = s
                continue
        # t >= 16: match instructions (shared by both states)
        if t >= 64:
            # M2: 1 byte operand; len 3..8, dist <= 2048
            h = byte()
            dist = ((t >> 2) & 7) + (h << 3) + 1
            length = (t >> 5) + 1
            s = t & 3
        elif t >= 32:
            # M3: dist <= 16384
            length = (t & 31) + 2 if (t & 31) else run_ext(31 + 2)
            d = le16()
            dist = (d >> 2) + 1
            s = d & 3
        else:
            # M4: 16..48 kB, or END marker
            hbit = (t & 8) << 11
            length = (t & 7) + 2 if (t & 7) else run_ext(7 + 2)
            d = le16()
            if hbit == 0 and (d >> 2) == 0:
                # end of stream: marker is opcode 17 (length bits 001)
                if t != 17 or d != 0:
                    raise Lzo1xError(
                        f"{origin}: malformed LZO1X end marker "
                        f"(opcode {t}, operand {d})"
                    )
                if ip != n:
                    raise Lzo1xError(
                        f"{origin}: {n - ip} trailing bytes after LZO1X "
                        "end marker"
                    )
                return bytes(out)
            dist = hbit + (d >> 2) + 16384
            s = d & 3
        _copy_match(out, dist, length, origin)
        literals(s)
        state = s


# ---------------------------------------------------------------------------
# fixture/interop encoder
# ---------------------------------------------------------------------------


def lzo1x_compress(data: bytes) -> bytes:
    """Greedy LZO1X ENCODER (fixture/interop): literal runs + M3
    matches (16 kB window, >= 3-byte matches found via a 3-gram hash
    chain) with the documented state transitions — 0..3 trailing
    literals ride the previous match's S bits, the stream starts with
    the first-byte special where the spec requires it, and ends with
    the ``11 00 00`` marker.  Output decodes with any LZO1X decoder;
    compression ratio is not a goal."""
    n = len(data)
    out = bytearray()
    heads: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    last_le16_lo: int | None = None  # index of last match's S-bit byte
    started = False

    def flush_literals(end: int, followed_by_match: bool) -> None:
        nonlocal lit_start, started, last_le16_lo
        count = end - lit_start
        if count == 0:
            return
        seg = data[lit_start:end]
        lit_start = end
        if not started and 1 <= count <= 3:
            # first-byte special: 18..20 copy 1..3 literals; the next
            # instruction must be a match (always true: callers only
            # hit this branch right before a match or the end marker,
            # and the end marker IS an M4 instruction)
            out.append(17 + count)
            out.extend(seg)
            started = True
            last_le16_lo = None
            return
        if count <= 3:
            if last_le16_lo is None:
                raise AssertionError(
                    "short literal gap with no previous match"
                )
            out[last_le16_lo] |= count  # patch S bits
            out.extend(seg)
            last_le16_lo = None
            return
        # regular long literal run: length = 3 + t
        t = count - 3
        if t <= 15:
            out.append(t)
        else:
            out.append(0)
            rem = t - 15  # >= 1, so the final byte is always nonzero
            while rem > 255:
                out.append(0)
                rem -= 255
            out.append(rem)
        out.extend(seg)
        started = True
        last_le16_lo = None

    def emit_m3(dist: int, length: int) -> None:
        nonlocal started, last_le16_lo
        t = length - 2
        if t <= 31:
            out.append(32 | t)
        else:
            out.append(32)
            rem = t - 31  # >= 1, so the final byte is always nonzero
            while rem > 255:
                out.append(0)
                rem -= 255
            out.append(rem)
        d = (dist - 1) << 2
        out.append(d & 0xFF)
        last_le16_lo = len(out) - 1
        out.append((d >> 8) & 0xFF)
        started = True

    while i + 3 <= n:
        key = data[i:i + 3]
        cand = heads.get(key)
        heads[key] = i
        if cand is not None and i - cand <= 16384:
            # extend the match greedily
            length = 3
            limit = n - i
            while length < limit and data[cand + length] == data[i + length]:
                length += 1
            flush_literals(i, followed_by_match=True)
            emit_m3(i - cand, length)
            # seed a few hash entries inside the match for later finds
            for j in range(i + 1, min(i + length, n - 2)):
                heads[data[j:j + 3]] = j
            i += length
            lit_start = i
        else:
            i += 1
    flush_literals(n, followed_by_match=False)
    out += b"\x11\x00\x00"
    return bytes(out)
