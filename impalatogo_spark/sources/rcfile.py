"""Pure-Python RCFile reader/writer — the fallback scan path for the
reference's RCFile scanner (`be/src/exec/hdfs-rcfile-scanner.cc`, 573 LoC;
header constants in `hdfs-rcfile-scanner.h`) in environments without Hive
SerDe tables.

Implemented from the public Hive RCFile container format
(org.apache.hadoop.hive.ql.io.RCFile):

  header (new style): "RCF" magic + version byte 1, boolean compressed,
    optional codec class name (vint-length UTF-8), metadata (int32 pair
    count + Text pairs — MUST include ``hive.io.rcfile.column.number``),
    16-byte sync marker.
  header (legacy style): a SequenceFile v6 header whose key/value classes
    are ``RCFile$KeyBuffer`` / ``RCFile$ValueBuffer`` (the form the
    reference's scanner recognizes, hdfs-rcfile-scanner.cc RCFILE_KEY_
    CLASS_NAME) — accepted on read.
  row group: optional sync escape (int32 -1 + 16-byte marker), then
    int32 recordLen (= keyLen + on-disk value bytes),
    int32 keyLen (UNcompressed key-buffer length),
    int32 compressedKeyLen, key-buffer bytes (codec-compressed when the
    file is compressed).
  key buffer: vlong rowCount, then per column: vlong on-disk value length,
    vlong uncompressed value length, vlong cell-length-buffer length,
    cell-length-buffer bytes — a run-length stream of vlongs where a plain
    value is a cell length and ``~runLength`` encodes extra repeats of the
    previous length.
  value part: per column, that column's cell bytes concatenated
    (independently codec-compressed when compressed).

Cell payloads use the ColumnarSerDe/LazySimpleSerDe text encoding (the
reference's default RCFile SerDe): UTF-8 text cells with ``\\N`` as NULL.
Only DefaultCodec (zlib) compression is supported; LZO is rejected (a
separately licensed plugin in the reference too).

Scale shape: like sources/avro.py and sources/seqfile.py,
``read_rcfile`` lists files with the binaryFile source and decodes inside
executors via mapInPandas — one task per file, Arrow-batched, no
driver-side rows. Column pruning happens at decode time: only requested
columns are materialized (the point of the columnar layout — the scanner
skips unwanted column byte ranges entirely, mirroring
hdfs-rcfile-scanner.cc's column-projection reads).
"""

from __future__ import annotations

import io
import os
import struct
import zlib
from typing import Iterator, Optional

from .seqfile import _read_vint, _write_vint, _read_class_name

RCF_MAGIC = b"RCF"
SEQ_MAGIC = b"SEQ"
_SYNC = b"\x00" * 4 + b"i2s_rcfsync!"  # writer's fixed 16-byte marker
NULL_CELL = b"\\N"  # LazySimpleSerDe default null sequence

KEY_CLASS = "org.apache.hadoop.hive.ql.io.RCFile$KeyBuffer"
VALUE_CLASS = "org.apache.hadoop.hive.ql.io.RCFile$ValueBuffer"
DEFAULT_CODEC = "org.apache.hadoop.io.compress.DefaultCodec"
COLUMN_NUMBER_KEY = "hive.io.rcfile.column.number"


# -- cell-length RLE (RCFile.ColumnBuffer value-length stream) ---------------

def _decode_cell_lengths(buf: bytes, n_rows: int) -> list[int]:
    """Run-length vlong stream -> one length per row: a non-negative vlong
    is a cell length; a negative vlong v encodes ~v extra repeats of the
    previous length."""
    out: list[int] = []
    pos = 0
    while len(out) < n_rows:
        v, pos = _read_vint(buf, pos)
        if v < 0:
            run = ~v
            out.extend([out[-1]] * run)
        else:
            out.append(v)
    if len(out) != n_rows:
        raise ValueError("RCFile cell-length stream longer than row count")
    return out


def _encode_cell_lengths(lengths: list[int]) -> bytes:
    out = io.BytesIO()
    prev: Optional[int] = None
    run = 0
    for ln in lengths:
        if ln == prev:
            run += 1
            continue
        if run:
            _write_vint(out, ~run)
        _write_vint(out, ln)
        prev, run = ln, 0
    if run:
        _write_vint(out, ~run)
    return out.getvalue()


# -- container decode --------------------------------------------------------

def _parse_header(data: bytes) -> tuple[int, Optional[str], int, bytes, int]:
    """Returns (n_cols, codec, pos, sync, version_style)."""
    if data[:3] == RCF_MAGIC:
        version = data[3]
        if version != 1:
            raise ValueError(f"unsupported RCFile version {version}")
        pos = 4
    elif data[:3] == SEQ_MAGIC and data[3] == 6:
        pos = 4
        key_cls, pos = _read_class_name(data, pos)
        val_cls, pos = _read_class_name(data, pos)
        if (key_cls, val_cls) != (KEY_CLASS, VALUE_CLASS):
            raise ValueError(
                "SEQ-header file is not an RCFile "
                f"(classes {key_cls!r}/{val_cls!r})"
            )
    else:
        raise ValueError("not an RCFile (bad magic)")
    compressed = data[pos] != 0
    pos += 1
    if data[:3] == SEQ_MAGIC:
        # legacy header carries SequenceFile's blockCompressed flag too
        if data[pos] != 0:
            raise ValueError("block-compressed RCFile flag is invalid")
        pos += 1
    codec = None
    if compressed:
        codec, pos = _read_class_name(data, pos)
        if codec != DEFAULT_CODEC:
            raise ValueError(f"unsupported codec: {codec}")
    n_meta = struct.unpack(">i", data[pos:pos + 4])[0]
    pos += 4
    meta: dict[str, str] = {}
    for _ in range(n_meta):
        n, pos = _read_vint(data, pos)
        k = data[pos:pos + n].decode("utf-8")
        pos += n
        n, pos = _read_vint(data, pos)
        v = data[pos:pos + n].decode("utf-8")
        pos += n
        meta[k] = v
    if COLUMN_NUMBER_KEY not in meta:
        raise ValueError(f"RCFile metadata missing {COLUMN_NUMBER_KEY}")
    n_cols = int(meta[COLUMN_NUMBER_KEY])
    sync = data[pos:pos + 16]
    pos += 16
    return n_cols, codec, pos, sync, 1


def decode_rcfile(
    data: bytes, columns: Optional[list[int]] = None
) -> tuple[int, list[list[Optional[bytes]]]]:
    """Parse one RCFile: (n_cols, rows). Each row is a list of cell byte
    strings (None for SerDe-NULL ``\\N`` cells). ``columns`` optionally
    projects a subset of column indexes — unprojected columns are never
    decompressed or sliced (columnar skip, the format's reason to exist)."""
    n_cols, codec, pos, sync, _ = _parse_header(data)
    proj = list(range(n_cols)) if columns is None else list(columns)
    rows: list[list[Optional[bytes]]] = []
    end = len(data)
    while pos < end:
        rec_len = struct.unpack(">i", data[pos:pos + 4])[0]
        pos += 4
        if rec_len == -1:  # sync escape
            if data[pos:pos + 16] != sync:
                raise ValueError("RCFile sync marker mismatch")
            pos += 16
            continue
        key_len = struct.unpack(">i", data[pos:pos + 4])[0]
        comp_key_len = struct.unpack(">i", data[pos + 4:pos + 8])[0]
        pos += 8
        key = data[pos:pos + comp_key_len]
        pos += comp_key_len
        if codec:
            key = zlib.decompress(key)
        if len(key) != key_len:
            raise ValueError("RCFile key-buffer length mismatch")
        kpos = 0
        n_rows, kpos = _read_vint(key, kpos)
        col_disk_len: list[int] = []
        col_plain_len: list[int] = []
        col_cell_lens: list[Optional[list[int]]] = []
        for c in range(n_cols):
            dlen, kpos = _read_vint(key, kpos)
            plen, kpos = _read_vint(key, kpos)
            lbuf_len, kpos = _read_vint(key, kpos)
            col_disk_len.append(dlen)
            col_plain_len.append(plen)
            if c in proj:
                col_cell_lens.append(
                    _decode_cell_lengths(key[kpos:kpos + lbuf_len], n_rows)
                )
            else:
                col_cell_lens.append(None)  # skipped column: lengths unread
            kpos += lbuf_len
        # value part: columns back to back; project by slicing offsets
        group_rows: list[list[Optional[bytes]]] = [
            [None] * len(proj) for _ in range(n_rows)
        ]
        off = pos
        for c in range(n_cols):
            if c in proj:
                blob = data[off:off + col_disk_len[c]]
                if codec:
                    blob = zlib.decompress(blob)
                if len(blob) != col_plain_len[c]:
                    raise ValueError("RCFile column length mismatch")
                cpos = 0
                out_idx = proj.index(c)
                for r, ln in enumerate(col_cell_lens[c]):
                    cell = blob[cpos:cpos + ln]
                    cpos += ln
                    group_rows[r][out_idx] = (
                        None if cell == NULL_CELL else cell
                    )
            off += col_disk_len[c]
        pos = off
        rows.extend(group_rows)
    return n_cols, rows


# -- container encode --------------------------------------------------------

def write_rcfile(
    path: str,
    rows: list[tuple],
    n_cols: int,
    compress: bool = False,
    rows_per_group: int = 1000,
) -> None:
    """Write rows as one RCFile (new-style "RCF" v1 header; DefaultCodec
    when compress=True). Cells are str/bytes/None; None encodes as the
    SerDe null sequence ``\\N``."""
    out = io.BytesIO()
    out.write(RCF_MAGIC + bytes([1]))
    out.write(bytes([1 if compress else 0]))
    if compress:
        raw = DEFAULT_CODEC.encode("utf-8")
        _write_vint(out, len(raw))
        out.write(raw)
    out.write(struct.pack(">i", 1))  # one metadata pair
    for text in (COLUMN_NUMBER_KEY, str(n_cols)):
        raw = text.encode("utf-8")
        _write_vint(out, len(raw))
        out.write(raw)
    out.write(_SYNC)
    for g0 in range(0, len(rows), rows_per_group):
        group = rows[g0:g0 + rows_per_group]
        if g0:
            out.write(struct.pack(">i", -1))
            out.write(_SYNC)
        # column-wise cell bytes + lengths
        col_blobs: list[bytes] = []
        col_lens: list[list[int]] = []
        for c in range(n_cols):
            cells = []
            for row in group:
                v = row[c]
                if v is None:
                    b = NULL_CELL
                elif isinstance(v, bytes):
                    b = v
                else:
                    b = str(v).encode("utf-8")
                cells.append(b)
            col_blobs.append(b"".join(cells))
            col_lens.append([len(b) for b in cells])
        disk_blobs = [
            zlib.compress(b) if compress else b for b in col_blobs
        ]
        key = io.BytesIO()
        _write_vint(key, len(group))
        for c in range(n_cols):
            lens_buf = _encode_cell_lengths(col_lens[c])
            _write_vint(key, len(disk_blobs[c]))
            _write_vint(key, len(col_blobs[c]))
            _write_vint(key, len(lens_buf))
            key.write(lens_buf)
        key_plain = key.getvalue()
        key_disk = zlib.compress(key_plain) if compress else key_plain
        rec_len = len(key_plain) + sum(len(b) for b in disk_blobs)
        out.write(struct.pack(">i", rec_len))
        out.write(struct.pack(">i", len(key_plain)))
        out.write(struct.pack(">i", len(key_disk)))
        out.write(key_disk)
        for b in disk_blobs:
            out.write(b)
    with open(path, "wb") as f:
        f.write(out.getvalue())


# -- Spark integration ------------------------------------------------------

def read_rcfile(spark, path: str, schema: str):
    """Read a directory (or file) of RCFiles as a typed DataFrame.

    ``schema`` is a Spark DDL string ("a INT, b STRING, ..."); cells decode
    as LazySimpleSerDe text and CAST to the declared types JVM-side
    (ansi=false NULL-on-garbage, matching the text scan path). Decode runs
    in executors via binaryFile + mapInPandas — one task per file. Only the
    schema's leading len(fields) columns are materialized from each row
    group (columnar projection)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    struct = StructType.fromDDL(schema)
    names = [f.name for f in struct.fields]
    proj = list(range(len(names)))

    def _decode_files(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for content in pdf["content"]:
                _, rows = decode_rcfile(bytes(content), columns=proj)
                yield pd.DataFrame(
                    {
                        name: [
                            None if r[i] is None else r[i].decode("utf-8")
                            for r in rows
                        ]
                        for i, name in enumerate(names)
                    }
                )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.rc")
        .load(path)
        .select("content")
    )
    text_schema = ", ".join(f"{n} string" for n in names)
    raw = files.mapInPandas(_decode_files, schema=text_schema)
    return raw.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in struct.fields]
    )
