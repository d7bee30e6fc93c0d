"""Pure-Python Avro Object Container File reader/writer with schema
resolution, as the fallback for the reference's Avro scanner
(`be/src/exec/hdfs-avro-scanner.cc:1-907`, `testdata/avro_schema_resolution/`)
in environments without the spark-avro module.

Everything here is implemented from the public Apache Avro 1.x specification
(container format: magic 'Obj\\x01', file-metadata map carrying
`avro.schema`/`avro.codec`, 16-byte sync marker, then blocks of
<record count, byte size, payload>; binary encoding: zigzag-varint
longs, length-prefixed bytes/strings, little-endian float/double,
block-encoded arrays/maps, index-prefixed unions).

Scale shape: `read_avro` lists files with Spark's binaryFile source and
decodes INSIDE executors via mapInPandas (Arrow-batched) — one task per
file, no driver-side row handling, so a directory of N avro files decodes
with N-way parallelism exactly like any other scan. The per-file payload
must fit in executor memory (binaryFile semantics) — the same granularity
the reference's one-scanner-per-split gives for unsplittable codecs.

Schema resolution follows the spec's rules the reference tests exercise
(schema-resolution matrix in hdfs-avro-scanner.cc):
  * reader fields matched to writer fields BY NAME (reordering is free);
  * writer-only fields are decoded and discarded;
  * reader-only fields take their default (error if no default);
  * promotions int->long->float->double, string<->bytes, and
    [null, X] unions on either side.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, Callable, Iterator

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary decoder
# ---------------------------------------------------------------------------

class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        shift, acc = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_utf8(self) -> str:
        return self.read_bytes().decode("utf-8")

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def _decode(r: _Reader, schema: Any) -> Any:
    """Decode one value of `schema` (parsed JSON form) from `r`."""
    if isinstance(schema, list):  # union: index then value
        return _decode(r, schema[r.read_long()])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: _decode(r, f["type"]) for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    break
                if n < 0:  # block with byte size hint
                    n = -n
                    r.read_long()
                for _ in range(n):
                    out.append(_decode(r, schema["items"]))
            return out
        if t == "map":
            out = {}
            while True:
                n = r.read_long()
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    # NB: key must be read before the value — a subscript
                    # assignment would evaluate its RHS first
                    k = r.read_utf8()
                    out[k] = _decode(r, schema["values"])
            return out
        if t == "enum":
            return schema["symbols"][r.read_long()]
        if t == "fixed":
            return r.read(schema["size"])
        return _decode(r, t)  # {'type': 'int'} primitive wrapper
    # primitive by name
    if schema == "null":
        return None
    if schema == "boolean":
        return r.read(1) != b"\x00"
    if schema in ("int", "long"):
        return r.read_long()
    if schema == "float":
        return struct.unpack("<f", r.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", r.read(8))[0]
    if schema == "bytes":
        return r.read_bytes()
    if schema == "string":
        return r.read_utf8()
    raise ValueError(f"unsupported avro type: {schema!r}")


# ---------------------------------------------------------------------------
# binary encoder (for tests / writers)
# ---------------------------------------------------------------------------

def _zigzag(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1) | 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(w: io.BytesIO, schema: Any, val: Any) -> None:
    if isinstance(schema, list):
        # union: pick the first matching branch (null vs not)
        for i, br in enumerate(schema):
            if (val is None) == (br == "null"):
                w.write(_zigzag(i))
                _encode(w, br, val)
                return
        raise ValueError(f"no union branch for {val!r} in {schema!r}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode(w, f["type"], val[f["name"]])
            return
        if t == "array":
            if val:
                w.write(_zigzag(len(val)))
                for v in val:
                    _encode(w, schema["items"], v)
            w.write(_zigzag(0))
            return
        if t == "map":
            if val:
                w.write(_zigzag(len(val)))
                for k, v in val.items():
                    _encode(w, "string", k)
                    _encode(w, schema["values"], v)
            w.write(_zigzag(0))
            return
        if t == "enum":
            w.write(_zigzag(schema["symbols"].index(val)))
            return
        if t == "fixed":
            w.write(val)
            return
        _encode(w, t, val)
        return
    if schema == "null":
        return
    if schema == "boolean":
        w.write(b"\x01" if val else b"\x00")
    elif schema in ("int", "long"):
        w.write(_zigzag(int(val)))
    elif schema == "float":
        w.write(struct.pack("<f", val))
    elif schema == "double":
        w.write(struct.pack("<d", val))
    elif schema == "bytes":
        w.write(_zigzag(len(val)) + bytes(val))
    elif schema == "string":
        b = val.encode("utf-8")
        w.write(_zigzag(len(b)) + b)
    else:
        raise ValueError(f"unsupported avro type: {schema!r}")


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------

def decode_container(data: bytes) -> tuple[Any, list[dict]]:
    """Parse one Object Container File: returns (writer_schema, records)."""
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    meta = _decode(r, {"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode()
    sync = r.read(16)
    records: list[dict] = []
    while not r.at_end():
        n = r.read_long()
        size = r.read_long()
        payload = r.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec: {codec}")
        br = _Reader(payload)
        for _ in range(n):
            records.append(_decode(br, schema))
        if r.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return schema, records


def write_container(path: str, schema: Any, records: list[dict],
                    codec: str = "null") -> None:
    """Write records as one Object Container File (null or deflate codec)."""
    body = io.BytesIO()
    for rec in records:
        _encode(body, schema, rec)
    payload = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
    elif codec != "null":
        raise ValueError(f"unsupported avro codec: {codec}")
    sync = b"\x00" * 8 + b"i2s_sync"  # fixed marker: deterministic output
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    out = io.BytesIO()
    out.write(MAGIC)
    _encode(out, {"type": "map", "values": "bytes"}, meta)
    out.write(sync)
    out.write(_zigzag(len(records)))
    out.write(_zigzag(len(payload)))
    out.write(payload)
    out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())


# ---------------------------------------------------------------------------
# schema resolution (reader vs writer)
# ---------------------------------------------------------------------------

_PROMOTIONS = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
}


def _nonnull(schema: Any) -> Any:
    """Strip [null, X] to X (the only union shape we map to columns)."""
    if isinstance(schema, list):
        br = [s for s in schema if s != "null"]
        if len(br) == 1:
            return br[0]
    return schema


def _promote(val: Any, w: Any, r: Any) -> Any:
    w, r = _nonnull(w), _nonnull(r)
    if val is None:
        return None
    if w == r or isinstance(r, (dict, list)) or isinstance(w, (dict, list)):
        return val
    if r not in _PROMOTIONS.get(w, ()):  # spec's promotion matrix
        raise ValueError(f"cannot resolve writer type {w!r} to reader {r!r}")
    if r in ("float", "double"):
        return float(val)
    if w == "string" and r == "bytes":
        return val.encode("utf-8")
    if w == "bytes" and r == "string":
        return val.decode("utf-8")
    return val


def resolve_record(rec: dict, writer: Any, reader: Any) -> dict:
    """Project one decoded writer record onto the reader schema: match by
    name, apply defaults for reader-only fields, drop writer-only fields,
    promote primitive types."""
    wfields = {f["name"]: f for f in writer["fields"]}
    out = {}
    for rf in reader["fields"]:
        name = rf["name"]
        if name in wfields:
            out[name] = _promote(rec[name], wfields[name]["type"], rf["type"])
        elif "default" in rf:
            out[name] = rf["default"]
        else:
            raise ValueError(
                f"reader field {name!r} missing from writer schema and has "
                f"no default"
            )
    return out


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

def avro_to_spark_type(schema: Any):
    """Map an Avro schema to the Spark type (DDL-building helper)."""
    from pyspark.sql import types as T

    schema = _nonnull(schema)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return T.StructType(
                [
                    T.StructField(f["name"], avro_to_spark_type(f["type"]), True)
                    for f in schema["fields"]
                ]
            )
        if t == "array":
            return T.ArrayType(avro_to_spark_type(schema["items"]))
        if t == "map":
            return T.MapType(T.StringType(), avro_to_spark_type(schema["values"]))
        if t == "enum":
            return T.StringType()
        if t == "fixed":
            return T.BinaryType()
        return avro_to_spark_type(t)
    return {
        "null": T.NullType(),
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
    }[schema]


def read_avro(spark, path: str, reader_schema: Any | None = None):
    """Read a directory (or single file) of Avro container files as a
    DataFrame, decoding in executors.

    binaryFile scan -> mapInPandas(decode + schema-resolve) — Arrow-batched,
    one task per file, driver handles zero rows. The column schema comes
    from `reader_schema` when given (schema resolution applies per file
    against each file's own writer schema), else from the first file's
    writer schema.
    """
    import pandas as pd

    if reader_schema is None:
        first = _first_avro_file(path)
        with open(first, "rb") as f:
            reader_schema, _ = decode_container(f.read())
    spark_schema = avro_to_spark_type(reader_schema)
    cols = [f["name"] for f in reader_schema["fields"]]
    rs = reader_schema  # capture plain JSON-able value, not a Column/DF

    def _decode_files(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for content in pdf["content"]:
                writer, recs = decode_container(bytes(content))
                rows = (
                    recs
                    if writer == rs
                    else [resolve_record(r, writer, rs) for r in recs]
                )
                yield pd.DataFrame(
                    {c: [r[c] for r in rows] for c in cols}, columns=cols
                )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
    )
    return files.mapInPandas(_decode_files, schema=spark_schema)


def _first_avro_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    for root, _, fs in sorted(os.walk(path)):
        for f in sorted(fs):
            if f.endswith(".avro"):
                return os.path.join(root, f)
    raise FileNotFoundError(f"no .avro files under {path}")
