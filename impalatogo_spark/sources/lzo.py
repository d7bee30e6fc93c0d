"""Pure-Python LZO text scan path — the reference's LZO scanner surface
(`be/src/exec/hdfs-lzo-text-scanner.cc`, which dlopens the separately-licensed
GPL codec plugin; the format itself is public).

Two public layers, both implemented from published format documentation:

  * LZO1X codec — the decompressor follows the documented LZO1X instruction
    stream (literal runs; M1/M2/M3/M4 match forms with their distance/length
    encodings, zero-byte length extension, 2-bit trailing-literal counts, and
    the 0x11 0x00 0x00 end marker). The compressor is a greedy hash-chain
    matcher emitting M2/M3/M4 + literal runs — valid streams, not maximal
    compression (correctness-first; the scan path only ever decompresses).
  * lzop container — magic, version/method/level/flags header with
    adler32/crc32 header checksum, then length-prefixed blocks with optional
    per-block checksums; a block whose compressed length equals its
    uncompressed length is stored raw (lzop's incompressible-block rule).
    This is the on-disk framing Hadoop's LzopCodec reads/writes for `.lzo`
    text tables.

Scale shape: `read_lzo_text` lists `.lzo` files with the binaryFile source
and decompresses + splits lines inside executors via mapInPandas — one task
per file (lzop is not block-splittable without a side index; the reference's
scanner has the same per-file constraint when no .index file exists),
Arrow-batched, no driver-side rows.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Iterator

LZOP_MAGIC = b"\x89LZO\x00\r\n\x1a\n"

# lzop header flags (public lzop.h constants)
F_ADLER32_D = 0x00000001
F_ADLER32_C = 0x00000002
F_CRC32_D = 0x00000100
F_CRC32_C = 0x00000200
F_H_CRC32 = 0x00001000

_M2_MAX_DIST = 0x0800
_M3_MAX_DIST = 0x4000
_M4_MAX_DIST = 0xBFFF


# -- LZO1X codec ------------------------------------------------------------

def lzo1x_decompress(src: bytes) -> bytes:
    """Decode one LZO1X instruction stream (documented algorithm: literal
    runs separated by matches; trailing-literal counts in the low 2 bits of
    the byte two before the current read position; M4 with zero distance is
    the end-of-stream marker)."""
    out = bytearray()
    ip = 0
    # mode 0: top of loop (next byte starts a literal run or match)
    # mode 1: match state (t already read; t<16 is the short M1 match)
    # mode 2: after a literal run (t already read; t<16 is the special
    #         first-literal-run M1 with the +0x800 distance base)
    mode = 0
    t = 0
    if src[ip] > 17:  # first-byte special: initial short literal run
        t0 = src[ip] - 17
        ip += 1
        out += src[ip:ip + t0]
        ip += t0
        t = src[ip]
        ip += 1
        mode = 1 if t0 < 4 else 2

    def copy_match(dist: int, length: int) -> None:
        pos = len(out) - dist
        if pos < 0:
            raise ValueError("corrupt LZO1X stream: distance before start")
        for _ in range(length):  # byte-at-a-time: overlapping copies are legal
            out.append(out[pos])
            pos += 1

    while True:
        if mode == 0:
            t = src[ip]
            ip += 1
            if t < 16:  # literal run (length >= 4; 1-3 only occur as trails)
                if t == 0:
                    while src[ip] == 0:
                        t += 255
                        ip += 1
                    t += 15 + src[ip]
                    ip += 1
                run = t + 3
                out += src[ip:ip + run]
                ip += run
                t = src[ip]
                ip += 1
                mode = 2
                continue
            mode = 1

        if mode == 2 and t < 16:
            # first-literal-run M1: 3-byte match, distance base 0x801
            d = 1 + 0x0800 + (t >> 2) + (src[ip] << 2)
            ip += 1
            copy_match(d, 3)
            trail = t & 3
        elif t >= 64:  # M2: len 3-8, dist <= 0x800
            d = 1 + ((t >> 2) & 7) + (src[ip] << 3)
            ip += 1
            copy_match(d, (t >> 5) + 1)
            trail = t & 3
        elif t >= 32:  # M3: len 3-33+ext, dist <= 0x4000
            length = t & 31
            if length == 0:
                while src[ip] == 0:
                    length += 255
                    ip += 1
                length += 31 + src[ip]
                ip += 1
            le16 = src[ip] | (src[ip + 1] << 8)
            ip += 2
            copy_match(1 + (le16 >> 2), length + 2)
            trail = le16 & 3
        elif t >= 16:  # M4: len 3-9+ext, dist 0x4000..0xBFFF; or end marker
            d_base = (t & 8) << 11
            length = t & 7
            if length == 0:
                while src[ip] == 0:
                    length += 255
                    ip += 1
                length += 7 + src[ip]
                ip += 1
            le16 = src[ip] | (src[ip + 1] << 8)
            ip += 2
            if d_base + (le16 >> 2) == 0:  # m_pos == op: end of stream
                return bytes(out)
            copy_match(0x4000 + d_base + (le16 >> 2), length + 2)
            trail = le16 & 3
        else:  # M1 (match state): 2-byte match, dist <= 0x400
            d = 1 + (t >> 2) + (src[ip] << 2)
            ip += 1
            copy_match(d, 2)
            trail = t & 3

        if trail:
            out += src[ip:ip + trail]
            ip += trail
            t = src[ip]
            ip += 1
            mode = 1  # after trailing literals the next byte is a match
        else:
            mode = 0


def _emit_run_length(out: bytearray, extra: int, base: int) -> None:
    """Zero-extended length encoding: `extra` above `base`, final byte 1-255."""
    if extra <= base:
        raise ValueError("not an extended length")
    extra -= base
    zeros, rem = divmod(extra, 255)
    if rem == 0:
        zeros, rem = zeros - 1, 255
    out += b"\x00" * zeros
    out.append(rem)


def lzo1x_compress(data: bytes) -> bytes:
    """Greedy LZO1X encoder: hash-4 candidate positions, longest-of-one
    candidate matches as M2/M3/M4, pending literals flushed as runs (or as
    the previous match's 2-bit trail when only 1-3 remain)."""
    n = len(data)
    out = bytearray()
    table: dict[bytes, int] = {}
    lit_start = 0
    trail_patch: int | None = None  # out-index whose low 2 bits hold trail
    i = 0

    def flush_literals(upto: int, at_end: bool) -> None:
        nonlocal lit_start, trail_patch, out
        length = upto - lit_start
        if length == 0:
            return
        chunk = data[lit_start:upto]
        lit_start = upto
        if length <= 3:
            if trail_patch is not None:
                out[trail_patch] |= length  # trail bits of previous match
                out += chunk
                return
            # stream start (or post-run): first-byte special 17+t covers 1-3
            if not out:
                out.append(17 + length)
                out += chunk
                return
            # 1-3 literals with no patchable match (can only follow a literal
            # run, which always leaves trail_patch set to None after at least
            # one match... fall through to a 4+ run is impossible, so borrow
            # the extended-run form with length>=4 never applies — encode via
            # first-byte path is gone; this cannot occur because runs merge)
            raise AssertionError("unreachable: short literal gap without match")
        if length <= 18:
            out.append(length - 3)
        else:
            out.append(0)
            _emit_run_length(out, length - 3, 15)
        out += chunk
        trail_patch = None  # a literal run forfeits the previous trail slot

    while i + 3 <= n:
        key = data[i:i + 4] if i + 4 <= n else data[i:i + 3] + b"\x00"
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > _M4_MAX_DIST:
            i += 1
            continue
        d = i - cand
        # verify + extend
        maxl = n - i
        length = 0
        while length < maxl and data[cand + length] == data[i + length]:
            length += 1
        if length < 3 or (length < 4 and d > _M3_MAX_DIST):
            i += 1
            continue
        flush_literals(i, at_end=False)
        if d <= _M2_MAX_DIST and length <= 8:
            dd = d - 1
            trail_patch = len(out)
            out.append(((length - 1) << 5) | ((dd & 7) << 2))
            out.append(dd >> 3)
        elif d <= _M3_MAX_DIST:
            length = min(length, 33)
            out.append(32 | (length - 2))
            le16 = (d - 1) << 2
            trail_patch = len(out)
            out.append(le16 & 0xFF)
            out.append(le16 >> 8)
        else:
            length = min(length, 9)
            dd = d - 0x4000
            out.append(16 | (8 if dd & 0x4000 else 0) | (length - 2))
            le16 = (dd & 0x3FFF) << 2
            trail_patch = len(out)
            out.append(le16 & 0xFF)
            out.append(le16 >> 8)
        # index the matched span so later data can reference it
        for j in range(i + 1, min(i + length, n - 3)):
            table[data[j:j + 4]] = j
        i += length
        lit_start = i
    flush_literals(n, at_end=True)
    out += b"\x11\x00\x00"  # end marker (M4, zero distance)
    return bytes(out)


# -- lzop container ----------------------------------------------------------

def write_lzop(path: str, data: bytes, block_size: int = 256 * 1024,
               flags: int = F_ADLER32_D) -> None:
    """Write one lzop file: header (version 0x1040-era layout with level
    byte), then blocks of `block_size` — each stored raw when compression
    does not shrink it (clen == ulen), matching lzop's rule."""
    hdr = bytearray()
    hdr += struct.pack(">H", 0x1040)  # lzop version
    hdr += struct.pack(">H", 0x2080)  # libLZO version
    hdr += struct.pack(">H", 0x0940)  # version needed to extract
    hdr.append(1)  # method: LZO1X-1
    hdr.append(5)  # level
    hdr += struct.pack(">I", flags)
    hdr += struct.pack(">I", 0o644)  # mode
    hdr += struct.pack(">I", 0)  # mtime low
    hdr += struct.pack(">I", 0)  # mtime high
    hdr.append(0)  # filename length
    if flags & F_H_CRC32:
        hdr += struct.pack(">I", zlib.crc32(bytes(hdr)))
    else:
        hdr += struct.pack(">I", zlib.adler32(bytes(hdr), 1))
    body = bytearray()
    for off in range(0, len(data), block_size):
        block = data[off:off + block_size]
        comp = lzo1x_compress(block)
        if len(comp) >= len(block):
            comp = block  # stored: clen == ulen means raw
        body += struct.pack(">I", len(block))
        body += struct.pack(">I", len(comp))
        if flags & F_ADLER32_D:
            body += struct.pack(">I", zlib.adler32(block, 1))
        if flags & F_CRC32_D:
            body += struct.pack(">I", zlib.crc32(block))
        if len(comp) != len(block):  # checksums of compressed data only
            if flags & F_ADLER32_C:
                body += struct.pack(">I", zlib.adler32(comp, 1))
            if flags & F_CRC32_C:
                body += struct.pack(">I", zlib.crc32(comp))
        body += comp
    body += struct.pack(">I", 0)  # EOF block
    with open(path, "wb") as f:
        f.write(LZOP_MAGIC + bytes(hdr) + bytes(body))


def read_lzop_bytes(raw: bytes) -> bytes:
    """Decode one lzop file to its uncompressed bytes, verifying header and
    per-block checksums per the header flags."""
    if not raw.startswith(LZOP_MAGIC):
        raise ValueError("not an lzop file (bad magic)")
    pos = len(LZOP_MAGIC)
    version, _libver, _extract = struct.unpack_from(">HHH", raw, pos)
    pos += 6
    method = raw[pos]
    pos += 1
    if version >= 0x0940:
        pos += 1  # level
    if method not in (1, 2, 3):  # LZO1X-1 / 1(15) / 999 share the bitstream
        raise ValueError(f"unsupported lzop method {method}")
    (flags,) = struct.unpack_from(">I", raw, pos)
    pos += 4
    if flags & 0x0800:  # F_H_FILTER
        pos += 4
    pos += 4  # mode
    pos += 4  # mtime low
    if version >= 0x0940:
        pos += 4  # mtime high
    fnlen = raw[pos]
    pos += 1 + fnlen
    hdr_body = raw[len(LZOP_MAGIC):pos]
    (hck,) = struct.unpack_from(">I", raw, pos)
    pos += 4
    want = (zlib.crc32(hdr_body) if flags & F_H_CRC32
            else zlib.adler32(hdr_body, 1))
    if hck != want:
        raise ValueError("lzop header checksum mismatch")
    out = bytearray()
    while True:
        (ulen,) = struct.unpack_from(">I", raw, pos)
        pos += 4
        if ulen == 0:
            break
        (clen,) = struct.unpack_from(">I", raw, pos)
        pos += 4
        d_adler = d_crc = None
        if flags & F_ADLER32_D:
            (d_adler,) = struct.unpack_from(">I", raw, pos)
            pos += 4
        if flags & F_CRC32_D:
            (d_crc,) = struct.unpack_from(">I", raw, pos)
            pos += 4
        if clen != ulen:
            if flags & F_ADLER32_C:
                pos += 4
            if flags & F_CRC32_C:
                pos += 4
        comp = raw[pos:pos + clen]
        pos += clen
        block = comp if clen == ulen else lzo1x_decompress(comp)
        if len(block) != ulen:
            raise ValueError("lzop block length mismatch after decompress")
        if d_adler is not None and zlib.adler32(block, 1) != d_adler:
            raise ValueError("lzop block adler32 mismatch")
        if d_crc is not None and zlib.crc32(block) != d_crc:
            raise ValueError("lzop block crc32 mismatch")
        out += block
    return bytes(out)


def write_lzo_text(path: str, lines: list[str],
                   block_size: int = 256 * 1024) -> None:
    """Write newline-delimited text as one .lzo file (test/fixture writer)."""
    write_lzop(path, ("\n".join(lines) + "\n").encode("utf-8"),
               block_size=block_size)


def read_lzo_text(spark, path: str):
    """LZO text scan: every `.lzo` under `path` -> DataFrame(line string).

    binaryFile listing + mapInPandas decode, one task per file — lzop frames
    are not splittable without a side index, so file-level parallelism is the
    correct unit (same constraint as the reference's LZO scanner without
    `.index` files). Decode bytes never pass through the driver.
    """
    import pandas as pd  # noqa: F401

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for b in batches:
            for _, row in b.iterrows():
                text = read_lzop_bytes(bytes(row["content"])).decode("utf-8")
                lines = text.split("\n")
                if lines and lines[-1] == "":
                    lines.pop()
                yield pd.DataFrame({"line": lines})

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.lzo")
        .load(path)
        .select("content")
    )
    return files.mapInPandas(_decode, schema="line string")
