"""Pure-Python Hadoop SequenceFile reader/writer, the fallback scan path for
the reference's SequenceFile scanner (`be/src/exec/hdfs-sequence-scanner.cc`,
497 LoC) in environments without Hive SerDe tables.

Implemented from the public Hadoop SequenceFile format (version 6):
  header: "SEQ" + version byte, key/value class names (vint-length UTF-8),
  compression + block-compression flag bytes, optional codec class name,
  metadata (int32 pair count + Text pairs), 16-byte sync marker;
  records: int32 record length, int32 key length, key bytes, value bytes,
  with an interleaved sync escape (record length == -1 followed by the
  16-byte marker). Record-compressed files (DefaultCodec = zlib) are
  supported; block-compressed and LZO files are rejected with a clear error
  (the LZO codec is a separate licensed plugin in the reference too —
  `hdfs-lzo-text-scanner.cc`).

Writable (de)serialization follows Hadoop WritableUtils:
  Text        vint length + UTF-8 bytes
  BytesWritable  int32 BE length + bytes
  LongWritable   8-byte BE; IntWritable 4-byte BE
  NullWritable   zero bytes

Scale shape: like sources/avro.py, `read_sequencefile` lists files with the
binaryFile source and decodes inside executors via mapInPandas — one task
per file, Arrow-batched, no driver-side rows.
"""

from __future__ import annotations

import io
import os
import struct
import zlib
from typing import Any, Callable, Iterator

SEQ_MAGIC = b"SEQ"
_SYNC = b"\x00" * 4 + b"i2s_seqsync!"  # writer's fixed 16-byte marker

TEXT = "org.apache.hadoop.io.Text"
BYTES = "org.apache.hadoop.io.BytesWritable"
LONG = "org.apache.hadoop.io.LongWritable"
INT = "org.apache.hadoop.io.IntWritable"
NULL = "org.apache.hadoop.io.NullWritable"
DEFAULT_CODEC = "org.apache.hadoop.io.compress.DefaultCodec"


# -- Hadoop vint (WritableUtils) --------------------------------------------

def _read_vint(buf: bytes, pos: int) -> tuple[int, int]:
    b = buf[pos] - 256 if buf[pos] > 127 else buf[pos]
    pos += 1
    if b >= -112:
        return b, pos
    neg = b < -120
    length = -(b + 120) if neg else -(b + 112)
    v = 0
    for i in range(length):
        v = (v << 8) | buf[pos + i]
    pos += length
    return (~v if neg else v), pos


def _write_vint(out: io.BytesIO, v: int) -> None:
    if -112 <= v <= 127:
        out.write(struct.pack("b", v))
        return
    length, tag = 0, -112
    if v < 0:
        v = ~v
        tag = -120
    tmp = v
    while tmp:
        length += 1
        tmp >>= 8
    out.write(struct.pack("b", tag - length))
    for i in range(length - 1, -1, -1):
        out.write(bytes([(v >> (8 * i)) & 0xFF]))


# -- writable codecs --------------------------------------------------------

def _decoder(cls: str) -> Callable[[bytes], Any]:
    if cls == TEXT:
        def d(b: bytes):
            n, p = _read_vint(b, 0)
            return b[p:p + n].decode("utf-8")
        return d
    if cls == BYTES:
        return lambda b: bytes(b[4:4 + struct.unpack(">i", b[:4])[0]])
    if cls == LONG:
        return lambda b: struct.unpack(">q", b)[0]
    if cls == INT:
        return lambda b: struct.unpack(">i", b)[0]
    if cls == NULL:
        return lambda b: None
    raise ValueError(f"unsupported writable class: {cls}")


def _encoder(cls: str) -> Callable[[Any], bytes]:
    if cls == TEXT:
        def e(v) -> bytes:
            raw = v.encode("utf-8")
            out = io.BytesIO()
            _write_vint(out, len(raw))
            return out.getvalue() + raw
        return e
    if cls == BYTES:
        return lambda v: struct.pack(">i", len(v)) + bytes(v)
    if cls == LONG:
        return lambda v: struct.pack(">q", v)
    if cls == INT:
        return lambda v: struct.pack(">i", v)
    if cls == NULL:
        return lambda v: b""
    raise ValueError(f"unsupported writable class: {cls}")


def _read_class_name(buf: bytes, pos: int) -> tuple[str, int]:
    n, pos = _read_vint(buf, pos)
    return buf[pos:pos + n].decode("utf-8"), pos + n


# -- container --------------------------------------------------------------

def decode_seqfile(data: bytes) -> tuple[str, str, list[tuple[Any, Any]]]:
    """Parse one SequenceFile: (key_class, value_class, [(key, value), ...])."""
    if data[:3] != SEQ_MAGIC:
        raise ValueError("not a SequenceFile (bad magic)")
    version = data[3]
    if version < 5:
        raise ValueError(f"unsupported SequenceFile version {version}")
    pos = 4
    key_cls, pos = _read_class_name(data, pos)
    val_cls, pos = _read_class_name(data, pos)
    compressed = data[pos] != 0
    block_compressed = data[pos + 1] != 0
    pos += 2
    if block_compressed:
        raise ValueError("block-compressed SequenceFiles not supported")
    codec = None
    if compressed:
        codec, pos = _read_class_name(data, pos)
        if codec != DEFAULT_CODEC:
            raise ValueError(f"unsupported codec: {codec}")
    n_meta = struct.unpack(">i", data[pos:pos + 4])[0]
    pos += 4
    for _ in range(n_meta):
        for _ in range(2):  # key and value Text
            n, pos = _read_vint(data, pos)
            pos += n
    sync = data[pos:pos + 16]
    pos += 16
    kdec, vdec = _decoder(key_cls), _decoder(val_cls)
    out: list[tuple[Any, Any]] = []
    end = len(data)
    while pos < end:
        rec_len = struct.unpack(">i", data[pos:pos + 4])[0]
        pos += 4
        if rec_len == -1:  # sync escape
            if data[pos:pos + 16] != sync:
                raise ValueError("SequenceFile sync marker mismatch")
            pos += 16
            continue
        key_len = struct.unpack(">i", data[pos:pos + 4])[0]
        pos += 4
        key = kdec(data[pos:pos + key_len])
        vbytes = data[pos + key_len:pos + rec_len]
        pos += rec_len
        if compressed:
            vbytes = zlib.decompress(vbytes)
        out.append((key, vdec(vbytes)))
    return key_cls, val_cls, out


def write_seqfile(path: str, records: list[tuple[Any, Any]],
                  key_cls: str = LONG, val_cls: str = TEXT,
                  compress: bool = False, sync_every: int = 100) -> None:
    """Write records as one SequenceFile (version 6; DefaultCodec when
    compress=True)."""
    kenc, venc = _encoder(key_cls), _encoder(val_cls)
    out = io.BytesIO()
    out.write(SEQ_MAGIC + bytes([6]))
    for cls in (key_cls, val_cls):
        raw = cls.encode("utf-8")
        _write_vint(out, len(raw))
        out.write(raw)
    out.write(bytes([1 if compress else 0, 0]))
    if compress:
        raw = DEFAULT_CODEC.encode("utf-8")
        _write_vint(out, len(raw))
        out.write(raw)
    out.write(struct.pack(">i", 0))  # empty metadata
    out.write(_SYNC)
    for i, (k, v) in enumerate(records):
        if i and i % sync_every == 0:
            out.write(struct.pack(">i", -1))
            out.write(_SYNC)
        kb, vb = kenc(k), venc(v)
        if compress:
            vb = zlib.compress(vb)
        out.write(struct.pack(">i", len(kb) + len(vb)))
        out.write(struct.pack(">i", len(kb)))
        out.write(kb)
        out.write(vb)
    with open(path, "wb") as f:
        f.write(out.getvalue())


# -- Spark integration ------------------------------------------------------

_SPARK_TYPES = {TEXT: "string", BYTES: "binary", LONG: "long", INT: "int",
                NULL: "string"}


def read_sequencefile(spark, path: str):
    """Read a directory (or file) of SequenceFiles as a (key, value)
    DataFrame — binaryFile scan + mapInPandas decode, one task per file.

    The (key, value) column types come from the first file's writable
    classes; all files must agree (the same contract Hadoop's
    SequenceFileInputFormat imposes per split).
    """
    import pandas as pd

    first = _first_seq_file(path)
    with open(first, "rb") as f:
        head = f.read()
    key_cls, val_cls, _ = decode_seqfile(head)
    schema = (
        f"key {_SPARK_TYPES[key_cls]}, value {_SPARK_TYPES[val_cls]}"
    )

    def _decode_files(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for content in pdf["content"]:
                kc, vc, recs = decode_seqfile(bytes(content))
                if (kc, vc) != (key_cls, val_cls):
                    raise ValueError(
                        f"SequenceFile class mismatch: {(kc, vc)} vs "
                        f"{(key_cls, val_cls)}"
                    )
                yield pd.DataFrame(
                    {"key": [r[0] for r in recs], "value": [r[1] for r in recs]}
                )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.seq")
        .load(path)
        .select("content")
    )
    return files.mapInPandas(_decode_files, schema=schema)


def _first_seq_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    for root, _, fs in sorted(os.walk(path)):
        for f in sorted(fs):
            if f.endswith(".seq"):
                return os.path.join(root, f)
    raise FileNotFoundError(f"no .seq files under {path}")
