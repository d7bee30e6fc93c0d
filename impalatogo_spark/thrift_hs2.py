"""Real HiveServer2 wire protocol: TCLIService over binary Thrift.

Reference parity: the reference daemon's front door is Apache Thrift —
HiveServer2's TCLIService (`be/src/service/impala-hs2-server.cc:442`
ExecuteStatement, `:884` GetOperationStatus, `:915` CancelOperation,
`:1048` GetLog) served on the hs2 port. The r03 JSON-lines server mirrors
that RPC surface but a stock HS2 client could not connect; this module
closes the gap by speaking the actual TCLIService binary-Thrift framing
in front of the SAME session/engine/admission core (server.I2SServer).

Everything here is derived from public specifications only: the Apache
Thrift binary protocol encoding (thrift.apache.org; TBinaryProtocol strict
framing) and the Apache Hive TCLIService.thrift IDL (field ids, enums and
struct shapes are part of the public HS2 interface). The container has no
thrift package, so the codec is hand-rolled the same way sources/avro.py
and sources/seqfile.py hand-roll their public byte formats.

Implemented RPCs (the classic no-SASL HS2 surface):
  OpenSession, CloseSession, ExecuteStatement (sync + runAsync),
  GetOperationStatus, CancelOperation, CloseOperation, GetLog,
  GetResultSetMetadata, FetchResults (V6 columnar TRowSet),
  GetSchemas, GetTables, GetColumns (metadata operations returning
  operation handles fetched like query results, as HS2 specifies).

Transports: raw/buffered binary Thrift (the NOSASL stack — TSocket +
TBufferedTransport + TBinaryProtocol) AND SASL-PLAIN (the thrift_sasl
framing impyla/beeline default to: status+length negotiation messages,
then length-prefixed data frames; RFC 4616 PLAIN initial response), with
per-connection auto-detection so one port serves both. Kerberos/GSSAPI
is environment-impossible here; documented out.

Scale posture: identical to server.py — a thin driver-side codec; every
statement runs through I2SServer's admission + async-operation core, so
the executor path cost is zero.
"""

from __future__ import annotations

import json
import socket
import socketserver
import struct
import threading
import time
import uuid

from .server import I2SServer, _AsyncOperation, _Operation

# ---------------------------------------------------------------------------
# Thrift binary protocol primitives (public encoding: each field is
# <type:i8><id:i16><value>, struct ends with STOP; strict messages are
# <0x8001_0001|type:i32><name:string><seqid:i32><args struct>)
# ---------------------------------------------------------------------------

T_STOP, T_BOOL, T_BYTE, T_DOUBLE = 0, 2, 3, 4
T_I16, T_I32, T_I64, T_STRING = 6, 8, 10, 11
T_STRUCT, T_MAP, T_SET, T_LIST = 12, 13, 14, 15

MSG_CALL, MSG_REPLY, MSG_EXCEPTION = 1, 2, 3
_VERSION_1 = 0x80010000


def _ttype(spec) -> int:
    if isinstance(spec, tuple):
        return {"struct": T_STRUCT, "list": T_LIST, "map": T_MAP}[spec[0]]
    return {"bool": T_BOOL, "byte": T_BYTE, "double": T_DOUBLE,
            "i16": T_I16, "i32": T_I32, "i64": T_I64,
            "str": T_STRING, "bin": T_STRING}[spec]


class TWriter:
    def __init__(self):
        self.buf = bytearray()

    def i8(self, v):
        self.buf += struct.pack("!b", v)

    def i16(self, v):
        self.buf += struct.pack("!h", v)

    def i32(self, v):
        # mask: the strict version word 0x8001000x is passed as unsigned
        self.buf += struct.pack("!I", v & 0xFFFFFFFF)

    def i64(self, v):
        self.buf += struct.pack("!q", v)

    def double(self, v):
        self.buf += struct.pack("!d", v)

    def binary(self, b: bytes):
        self.buf += struct.pack("!i", len(b))
        self.buf += b

    def string(self, s: str):
        self.binary(s.encode("utf-8"))

    def value(self, spec, v):
        if isinstance(spec, tuple):
            kind = spec[0]
            if kind == "struct":
                self.struct_(spec[1], v)
            elif kind == "list":
                elem = spec[1]
                self.i8(_ttype(elem))
                self.i32(len(v))
                for x in v:
                    self.value(elem, x)
            elif kind == "map":
                kspec, vspec = spec[1], spec[2]
                self.i8(_ttype(kspec))
                self.i8(_ttype(vspec))
                self.i32(len(v))
                for k, x in v.items():
                    self.value(kspec, k)
                    self.value(vspec, x)
            return
        if spec == "bool":
            self.i8(1 if v else 0)
        elif spec == "byte":
            self.i8(v)
        elif spec == "double":
            self.double(v)
        elif spec == "i16":
            self.i16(v)
        elif spec == "i32":
            self.i32(v)
        elif spec == "i64":
            self.i64(v)
        elif spec == "str":
            self.string(v)
        elif spec == "bin":
            self.binary(bytes(v))

    def struct_(self, fields: dict, values: dict):
        """fields: {fid: (name, spec)}; values keyed by name. None/missing
        fields are skipped (thrift optional-field convention)."""
        for fid, (name, spec) in fields.items():
            v = values.get(name)
            if v is None:
                continue
            self.i8(_ttype(spec))
            self.i16(fid)
            self.value(spec, v)
        self.i8(T_STOP)


class TReader:
    def __init__(self, rfile):
        self.r = rfile

    def _read(self, n: int) -> bytes:
        out = b""
        while len(out) < n:
            chunk = self.r.read(n - len(out))
            if not chunk:
                raise EOFError("connection closed mid-message")
            out += chunk
        return out

    def i8(self):
        return struct.unpack("!b", self._read(1))[0]

    def i16(self):
        return struct.unpack("!h", self._read(2))[0]

    def i32(self):
        return struct.unpack("!i", self._read(4))[0]

    def i64(self):
        return struct.unpack("!q", self._read(8))[0]

    def double(self):
        return struct.unpack("!d", self._read(8))[0]

    def binary(self):
        return self._read(self.i32())

    def string(self):
        return self.binary().decode("utf-8")

    def skip(self, ttype: int):
        if ttype == T_BOOL or ttype == T_BYTE:
            self._read(1)
        elif ttype == T_I16:
            self._read(2)
        elif ttype == T_I32:
            self._read(4)
        elif ttype in (T_I64, T_DOUBLE):
            self._read(8)
        elif ttype == T_STRING:
            self.binary()
        elif ttype == T_STRUCT:
            while True:
                ft = self.i8()
                if ft == T_STOP:
                    return
                self.i16()
                self.skip(ft)
        elif ttype in (T_LIST, T_SET):
            et, n = self.i8(), self.i32()
            for _ in range(n):
                self.skip(et)
        elif ttype == T_MAP:
            kt, vt, n = self.i8(), self.i8(), self.i32()
            for _ in range(n):
                self.skip(kt)
                self.skip(vt)
        else:
            raise ValueError(f"cannot skip thrift type {ttype}")

    def value(self, spec):
        if isinstance(spec, tuple):
            kind = spec[0]
            if kind == "struct":
                return self.struct_(spec[1])
            if kind == "list":
                elem = spec[1]
                self.i8()  # element type (trusted from spec)
                return [self.value(elem) for _ in range(self.i32())]
            if kind == "map":
                self.i8()
                self.i8()
                n = self.i32()
                return {self.value(spec[1]): self.value(spec[2])
                        for _ in range(n)}
        if spec == "bool":
            return self.i8() != 0
        if spec == "byte":
            return self.i8()
        if spec == "double":
            return self.double()
        if spec == "i16":
            return self.i16()
        if spec == "i32":
            return self.i32()
        if spec == "i64":
            return self.i64()
        if spec == "str":
            return self.string()
        if spec == "bin":
            return self.binary()
        raise ValueError(f"unknown spec {spec!r}")

    def struct_(self, fields: dict) -> dict:
        out = {}
        while True:
            ft = self.i8()
            if ft == T_STOP:
                return out
            fid = self.i16()
            if fid in fields and _ttype(fields[fid][1]) == ft:
                name, spec = fields[fid]
                out[name] = self.value(spec)
            else:  # unknown/renumbered field: skip by wire type
                self.skip(ft)


def write_message(wfile, name: str, mtype: int, seqid: int,
                  args_fields: dict, values: dict) -> None:
    w = TWriter()
    w.i32(_VERSION_1 | mtype)
    w.string(name)
    w.i32(seqid)
    w.struct_(args_fields, values)
    wfile.write(bytes(w.buf))
    wfile.flush()


def read_message_header(r: TReader) -> tuple[str, int, int]:
    first = r.i32()
    if first < 0:  # strict framing: 0x8001_000<type> as a signed i32
        mtype = first & 0xFF
        name = r.string()
        seqid = r.i32()
    else:  # old-style framing (strictWrite=False clients): <len><name>...
        name = r._read(first).decode("utf-8")
        mtype = r.i8()
        seqid = r.i32()
    return name, mtype, seqid


# ---------------------------------------------------------------------------
# TCLIService IDL subset (field ids per the public Apache Hive
# TCLIService.thrift, which Impala's hs2 front door implements)
# ---------------------------------------------------------------------------

# enums
PROTOCOL_V6 = 5  # HIVE_CLI_SERVICE_PROTOCOL_V6: columnar TRowSet
STATUS_SUCCESS, STATUS_STILL_EXECUTING, STATUS_ERROR = 0, 2, 3
OP_STATE = {"INITIALIZED": 0, "RUNNING": 1, "FINISHED": 2, "CANCELED": 3,
            "CLOSED": 4, "ERROR": 5, "PENDING": 7}
TYPE_ID = {"boolean": 0, "tinyint": 1, "smallint": 2, "int": 3, "bigint": 4,
           "float": 5, "double": 6, "string": 7, "timestamp": 8, "binary": 9,
           "decimal": 15, "null": 16, "date": 17, "varchar": 18, "char": 19}
OPTYPE_EXECUTE, OPTYPE_GET_SCHEMAS, OPTYPE_GET_TABLES, OPTYPE_GET_COLUMNS = \
    0, 3, 4, 6

STATUS = ("struct", {1: ("statusCode", "i32"),
                     2: ("infoMessages", ("list", "str")),
                     3: ("sqlState", "str"), 4: ("errorCode", "i32"),
                     5: ("errorMessage", "str")})
HANDLE_ID = ("struct", {1: ("guid", "bin"), 2: ("secret", "bin")})
SESSION_HANDLE = ("struct", {1: ("sessionId", HANDLE_ID)})
OPERATION_HANDLE = ("struct", {1: ("operationId", HANDLE_ID),
                               2: ("operationType", "i32"),
                               3: ("hasResultSet", "bool"),
                               4: ("modifiedRowCount", "double")})

OPEN_SESSION_REQ = ("struct", {1: ("client_protocol", "i32"),
                               2: ("username", "str"), 3: ("password", "str"),
                               4: ("configuration", ("map", "str", "str"))})
OPEN_SESSION_RESP = ("struct", {1: ("status", STATUS),
                                2: ("serverProtocolVersion", "i32"),
                                3: ("sessionHandle", SESSION_HANDLE),
                                4: ("configuration", ("map", "str", "str"))})
CLOSE_SESSION_REQ = ("struct", {1: ("sessionHandle", SESSION_HANDLE)})
STATUS_RESP = ("struct", {1: ("status", STATUS)})

EXECUTE_REQ = ("struct", {1: ("sessionHandle", SESSION_HANDLE),
                          2: ("statement", "str"),
                          3: ("confOverlay", ("map", "str", "str")),
                          4: ("runAsync", "bool"),
                          5: ("queryTimeout", "i64")})
OPHANDLE_RESP = ("struct", {1: ("status", STATUS),
                            2: ("operationHandle", OPERATION_HANDLE)})

OP_REQ = ("struct", {1: ("operationHandle", OPERATION_HANDLE)})
GET_OP_STATUS_RESP = ("struct", {1: ("status", STATUS),
                                 2: ("operationState", "i32"),
                                 3: ("sqlState", "str"),
                                 4: ("errorCode", "i32"),
                                 5: ("errorMessage", "str")})
GET_LOG_RESP = ("struct", {1: ("status", STATUS), 2: ("log", "str")})

PRIM_ENTRY = ("struct", {1: ("type", "i32")})
TYPE_ENTRY = ("struct", {1: ("primitiveEntry", PRIM_ENTRY)})
TYPE_DESC = ("struct", {1: ("types", ("list", TYPE_ENTRY))})
COLUMN_DESC = ("struct", {1: ("columnName", "str"),
                          2: ("typeDesc", TYPE_DESC),
                          3: ("position", "i32"), 4: ("comment", "str")})
TABLE_SCHEMA = ("struct", {1: ("columns", ("list", COLUMN_DESC))})
GET_RSMD_RESP = ("struct", {1: ("status", STATUS),
                            2: ("schema", TABLE_SCHEMA)})

FETCH_REQ = ("struct", {1: ("operationHandle", OPERATION_HANDLE),
                        2: ("orientation", "i32"), 3: ("maxRows", "i64"),
                        4: ("fetchType", "i16")})


def _typed_col(vtype: str):
    return ("struct", {1: ("values", ("list", vtype)), 2: ("nulls", "bin")})


COLUMN = ("struct", {1: ("boolVal", _typed_col("bool")),
                     2: ("byteVal", _typed_col("byte")),
                     3: ("i16Val", _typed_col("i16")),
                     4: ("i32Val", _typed_col("i32")),
                     5: ("i64Val", _typed_col("i64")),
                     6: ("doubleVal", _typed_col("double")),
                     7: ("stringVal", _typed_col("str")),
                     8: ("binaryVal", _typed_col("bin"))})
# row-oriented TRow/TColumnValue (TCLIService.thrift:319-332): what
# pre-V6 clients fetch; V6+ sessions get the required-but-empty `rows`
# list next to the columnar slots
def _opt_val(t):
    return ("struct", {1: ("value", t)})


COLUMN_VALUE = ("struct", {1: ("boolVal", _opt_val("bool")),
                           2: ("byteVal", _opt_val("byte")),
                           3: ("i16Val", _opt_val("i16")),
                           4: ("i32Val", _opt_val("i32")),
                           5: ("i64Val", _opt_val("i64")),
                           6: ("doubleVal", _opt_val("double")),
                           7: ("stringVal", _opt_val("str"))})
ROW = ("struct", {1: ("colVals", ("list", COLUMN_VALUE))})
ROWSET = ("struct", {1: ("startRowOffset", "i64"),
                     2: ("rows", ("list", ROW)),
                     3: ("columns", ("list", COLUMN))})
FETCH_RESP = ("struct", {1: ("status", STATUS), 2: ("hasMoreRows", "bool"),
                         3: ("results", ROWSET)})

GET_SCHEMAS_REQ = ("struct", {1: ("sessionHandle", SESSION_HANDLE),
                              2: ("catalogName", "str"),
                              3: ("schemaName", "str")})
GET_TABLES_REQ = ("struct", {1: ("sessionHandle", SESSION_HANDLE),
                             2: ("catalogName", "str"),
                             3: ("schemaName", "str"),
                             4: ("tableName", "str"),
                             5: ("tableTypes", ("list", "str"))})
GET_COLUMNS_REQ = ("struct", {1: ("sessionHandle", SESSION_HANDLE),
                              2: ("catalogName", "str"),
                              3: ("schemaName", "str"),
                              4: ("tableName", "str"),
                              5: ("columnName", "str")})
GET_FUNCTIONS_REQ = ("struct", {1: ("sessionHandle", SESSION_HANDLE),
                                2: ("catalogName", "str"),
                                3: ("schemaName", "str"),
                                4: ("functionName", "str")})
SESSION_ONLY_REQ = ("struct", {1: ("sessionHandle", SESSION_HANDLE)})
GET_INFO_REQ = ("struct", {1: ("sessionHandle", SESSION_HANDLE),
                           2: ("infoType", "i32")})
GET_INFO_VALUE = ("struct", {1: ("stringValue", "str"),
                             2: ("smallIntValue", "i16"),
                             3: ("integerBitmask", "i32"),
                             4: ("integerFlag", "i32"),
                             5: ("binaryValue", "i32"),
                             6: ("lenValue", "i64")})
GET_INFO_RESP = ("struct", {1: ("status", STATUS),
                            2: ("infoValue", GET_INFO_VALUE)})
# TGetInfoType codes (public ODBC-derived enum in TCLIService.thrift)
INFO_CLI_SERVER_NAME, INFO_CLI_DBMS_NAME, INFO_CLI_DBMS_VER = 13, 17, 18

# -- ImpalaHiveServer2Service extensions (ImpalaService.thrift:234-262) +
#    the ExecStats.thrift summary structs shared with the Beeswax door --
IMPALA_T_STATUS = ("struct", {1: ("status_code", "i32"),
                              2: ("error_msgs", ("list", "str"))})
EXEC_STATS = ("struct", {1: ("latency_ns", "i64"), 2: ("cpu_time_ns", "i64"),
                         3: ("cardinality", "i64"),
                         4: ("memory_used", "i64")})
PLAN_NODE_EXEC_SUMMARY = ("struct", {
    1: ("node_id", "i32"), 2: ("fragment_id", "i32"), 3: ("label", "str"),
    4: ("label_detail", "str"), 5: ("num_children", "i32"),
    6: ("estimated_stats", EXEC_STATS),
    7: ("exec_stats", ("list", EXEC_STATS)),
    8: ("is_active", ("list", "bool")), 9: ("is_broadcast", "bool")})
EXEC_SUMMARY = ("struct", {
    1: ("state", "i32"), 2: ("status", IMPALA_T_STATUS),
    3: ("nodes", ("list", PLAN_NODE_EXEC_SUMMARY)),
    4: ("exch_to_sender_map", ("map", "i32", "i32")),
    5: ("error_logs", ("list", "str"))})
GET_EXEC_SUMMARY_REQ = ("struct", {
    1: ("operationHandle", OPERATION_HANDLE),
    2: ("sessionHandle", SESSION_HANDLE)})
GET_EXEC_SUMMARY_RESP = ("struct", {1: ("status", STATUS),
                                    2: ("summary", EXEC_SUMMARY)})
GET_RUNTIME_PROFILE_REQ = ("struct", {
    1: ("operationHandle", OPERATION_HANDLE),
    2: ("sessionHandle", SESSION_HANDLE)})
GET_RUNTIME_PROFILE_RESP = ("struct", {1: ("status", STATUS),
                                       2: ("profile", "str")})

# method name -> (args spec {fid: (name, spec)}, result spec for `success`)
METHODS = {
    "OpenSession": ({1: ("req", OPEN_SESSION_REQ)}, OPEN_SESSION_RESP),
    "CloseSession": ({1: ("req", CLOSE_SESSION_REQ)}, STATUS_RESP),
    "ExecuteStatement": ({1: ("req", EXECUTE_REQ)}, OPHANDLE_RESP),
    "GetOperationStatus": ({1: ("req", OP_REQ)}, GET_OP_STATUS_RESP),
    "CancelOperation": ({1: ("req", OP_REQ)}, STATUS_RESP),
    "CloseOperation": ({1: ("req", OP_REQ)}, STATUS_RESP),
    "GetLog": ({1: ("req", OP_REQ)}, GET_LOG_RESP),
    "GetResultSetMetadata": ({1: ("req", OP_REQ)}, GET_RSMD_RESP),
    "FetchResults": ({1: ("req", FETCH_REQ)}, FETCH_RESP),
    "GetSchemas": ({1: ("req", GET_SCHEMAS_REQ)}, OPHANDLE_RESP),
    "GetTables": ({1: ("req", GET_TABLES_REQ)}, OPHANDLE_RESP),
    "GetColumns": ({1: ("req", GET_COLUMNS_REQ)}, OPHANDLE_RESP),
    "GetFunctions": ({1: ("req", GET_FUNCTIONS_REQ)}, OPHANDLE_RESP),
    "GetCatalogs": ({1: ("req", SESSION_ONLY_REQ)}, OPHANDLE_RESP),
    "GetTableTypes": ({1: ("req", SESSION_ONLY_REQ)}, OPHANDLE_RESP),
    "GetTypeInfo": ({1: ("req", SESSION_ONLY_REQ)}, OPHANDLE_RESP),
    "GetInfo": ({1: ("req", GET_INFO_REQ)}, GET_INFO_RESP),
    # ImpalaHiveServer2Service extensions (ImpalaService.thrift:260-262)
    "GetExecSummary": ({1: ("req", GET_EXEC_SUMMARY_REQ)},
                       GET_EXEC_SUMMARY_RESP),
    "GetRuntimeProfile": ({1: ("req", GET_RUNTIME_PROFILE_REQ)},
                          GET_RUNTIME_PROFILE_RESP),
    # Delegation-token trio (TCLIService.thrift): answered, not supported —
    # HiveServer2 itself rejects these outside kerberos deployments, and a
    # client that probes them must get a well-formed ERROR_STATUS frame,
    # never an unknown-method exception that kills the transport.
    "GetDelegationToken": (
        {1: ("req", ("struct", {1: ("sessionHandle", SESSION_HANDLE),
                                2: ("owner", "str"),
                                3: ("renewer", "str")}))},
        ("struct", {1: ("status", STATUS),
                    2: ("delegationToken", "str")})),
    "CancelDelegationToken": (
        {1: ("req", ("struct", {1: ("sessionHandle", SESSION_HANDLE),
                                2: ("delegationToken", "str")}))},
        STATUS_RESP),
    "RenewDelegationToken": (
        {1: ("req", ("struct", {1: ("sessionHandle", SESSION_HANDLE),
                                2: ("delegationToken", "str")}))},
        STATUS_RESP),
}

APP_EXCEPTION = ("struct", {1: ("message", "str"), 2: ("type", "i32")})


# ---------------------------------------------------------------------------
# value <-> wire helpers
# ---------------------------------------------------------------------------

_WIRE_SLOT = {"boolean": ("boolVal", False),
              "tinyint": ("byteVal", 0), "smallint": ("i16Val", 0),
              "int": ("i32Val", 0), "bigint": ("i64Val", 0),
              "float": ("doubleVal", 0.0), "double": ("doubleVal", 0.0)}


def _type_id(simple: str) -> int:
    base = simple.split("(")[0].split("<")[0]
    if base in TYPE_ID:
        return TYPE_ID[base]
    if base == "array":
        return 10
    if base == "map":
        return 11
    if base == "struct":
        return 12
    return TYPE_ID["string"]


def _encode_column(simple: str, values: list) -> dict:
    """One result column -> TColumn union value: typed slot for scalar
    numerics/bools, stringVal for everything else (HS2 sends timestamps,
    dates and decimals as strings; complex types as their string form)."""
    slot, filler = _WIRE_SLOT.get(simple.split("(")[0], ("stringVal", ""))
    nulls = bytearray((len(values) + 7) // 8)
    out = []
    for i, v in enumerate(values):
        if v is None:
            nulls[i // 8] |= 1 << (i % 8)
            out.append(filler)
        elif slot == "stringVal" and not isinstance(v, str):
            out.append(json.dumps(v))
        elif slot == "doubleVal":
            out.append(float(v))
        elif slot == "boolVal":
            out.append(bool(v))
        elif slot != "stringVal":
            out.append(int(v))
        else:
            out.append(v)
    return {slot: {"values": out, "nulls": bytes(nulls)}}


def _encode_value(simple: str, v) -> dict:
    """One cell -> TColumnValue union (pre-V6 row-oriented FetchResults).
    NULL is the type's slot with its optional value unset, per the IDL."""
    slot, _ = _WIRE_SLOT.get(simple.split("(")[0], ("stringVal", ""))
    if v is None:
        return {slot: {}}
    if slot == "stringVal":
        return {slot: {"value": v if isinstance(v, str) else json.dumps(v)}}
    if slot == "doubleVal":
        return {slot: {"value": float(v)}}
    if slot == "boolVal":
        return {slot: {"value": bool(v)}}
    return {slot: {"value": int(v)}}


def decode_value(cv: dict) -> object:
    """TColumnValue -> python value (committed pre-V6 client side)."""
    for slot in ("boolVal", "byteVal", "i16Val", "i32Val", "i64Val",
                 "doubleVal", "stringVal"):
        if cv.get(slot) is not None:
            return cv[slot].get("value")
    return None


def decode_column(col: dict) -> list:
    """TColumn union -> python list with Nones (client side)."""
    (slot, payload), = col.items()
    values, nulls = payload["values"], payload["nulls"]
    return [None if i // 8 < len(nulls) and nulls[i // 8] & (1 << (i % 8))
            else v for i, v in enumerate(values)]


def _guid(sid: str) -> bytes:
    return sid.encode("ascii").ljust(16, b"\0")


def _unguid(guid: bytes) -> str:
    return bytes(guid).rstrip(b"\0").decode("ascii", errors="replace")


def _ok_status() -> dict:
    return {"statusCode": STATUS_SUCCESS}


def _err_status(msg: str) -> dict:
    return {"statusCode": STATUS_ERROR, "errorMessage": msg,
            "sqlState": "HY000"}


# ---------------------------------------------------------------------------
# SASL-PLAIN transport (the public thrift_sasl framing impyla/beeline use
# by default against HS2: negotiation messages are <status:u8><len:u32be>
# <payload>, with START=1 OK=2 BAD=3 ERROR=4 COMPLETE=5; after COMPLETE
# every thrift message rides in a <len:u32be><payload> frame). PLAIN's
# initial response is authzid NUL authcid NUL password (RFC 4616).
# ---------------------------------------------------------------------------

SASL_START, SASL_OK, SASL_BAD, SASL_ERROR, SASL_COMPLETE = 1, 2, 3, 4, 5


def _sasl_read_msg(rfile) -> tuple[int, bytes]:
    head = rfile.read(5)
    if len(head) < 5:
        raise EOFError("connection closed during SASL negotiation")
    status = head[0]
    n = struct.unpack("!I", head[1:5])[0]
    payload = rfile.read(n) if n else b""
    return status, payload


def _sasl_write_msg(wfile, status: int, payload: bytes = b"") -> None:
    wfile.write(bytes([status]) + struct.pack("!I", len(payload)) + payload)
    wfile.flush()


class _FramedIO:
    """Length-prefixed frame wrapper presenting file-like read/write over
    the post-negotiation SASL data stream."""

    def __init__(self, rfile, wfile):
        self._rfile, self._wfile = rfile, wfile
        self._buf = b""
        self._out = bytearray()

    def read(self, n: int) -> bytes:
        while len(self._buf) < n:
            head = self._rfile.read(4)
            if len(head) < 4:
                if self._buf:
                    out, self._buf = self._buf, b""
                    return out
                return b""
            size = struct.unpack("!I", head)[0]
            self._buf += self._rfile.read(size)
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def write(self, data: bytes) -> None:
        self._out += data

    def flush(self) -> None:
        if self._out:
            payload = bytes(self._out)
            self._out = bytearray()
            self._wfile.write(struct.pack("!I", len(payload)) + payload)
            self._wfile.flush()


def sasl_server_handshake(rfile, wfile,
                          check=None) -> tuple[str, str] | None:
    """Run the server side of a SASL-PLAIN negotiation. Returns
    (username, password) on success, None on failure (after replying
    BAD/ERROR). `check(user, password) -> bool` is the optional
    authenticator (default: accept all, the reference's no-auth mode)."""
    status, mech = _sasl_read_msg(rfile)
    if status != SASL_START or mech.upper() != b"PLAIN":
        _sasl_write_msg(wfile, SASL_BAD,
                        b"only the PLAIN mechanism is supported")
        return None
    status, initial = _sasl_read_msg(rfile)
    if status not in (SASL_OK, SASL_COMPLETE):
        _sasl_write_msg(wfile, SASL_BAD, b"expected PLAIN initial response")
        return None
    parts = initial.split(b"\0")
    if len(parts) != 3:
        _sasl_write_msg(wfile, SASL_ERROR, b"malformed PLAIN response")
        return None
    user = parts[1].decode("utf-8", errors="replace")
    password = parts[2].decode("utf-8", errors="replace")
    if check is not None and not check(user, password):
        _sasl_write_msg(wfile, SASL_ERROR, b"authentication failed")
        return None
    _sasl_write_msg(wfile, SASL_COMPLETE)
    return user, password


def sasl_client_handshake(rfile, wfile, username: str,
                          password: str) -> None:
    _sasl_write_msg(wfile, SASL_START, b"PLAIN")
    _sasl_write_msg(wfile, SASL_OK,
                    b"\0" + username.encode() + b"\0" + password.encode())
    status, payload = _sasl_read_msg(rfile)
    if status != SASL_COMPLETE:
        raise ConnectionError(
            f"SASL negotiation failed (status {status}): "
            f"{payload.decode('utf-8', errors='replace')}")


# ---------------------------------------------------------------------------
# server
# ---------------------------------------------------------------------------

class HS2ThriftServer:
    """TCLIService daemon sharing one I2SServer session/admission core.

    `core` may be an existing I2SServer (serve both protocols off one
    session registry) or None to create a private one."""

    def __init__(self, spark, sf_dir: str | None = None,
                 host: str = "127.0.0.1", port: int = 0,
                 core: I2SServer | None = None, sasl_check=None, tls=None):
        self.core = core or I2SServer(spark, sf_dir=sf_dir)
        self._host, self._port = host, port
        self._tcp = None
        self._thread = None
        # optional PLAIN authenticator (user, password) -> bool; None =
        # accept-all, the reference daemon's default no-auth posture
        self.sasl_check = sasl_check
        # optional tls.TlsConfig: TLS-only port; SASL-PLAIN composes
        # inside the channel (thrift-server.cc EnableSsl + authentication)
        self._tls = tls
        # per-session negotiated HS2 protocol version (OpenSession)
        self._proto: dict[str, int] = {}

    # -- lifecycle --

    def start(self) -> tuple[str, int]:
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                # transport auto-detect: a SASL negotiation opens with the
                # START status byte (0x01); a raw binary-thrift message
                # opens with 0x80 (strict) or a length byte (old-style) —
                # never 0x01 (that would be a 16M+ name). One port serves
                # both NOSASL and SASL-PLAIN clients.
                first = self.rfile.peek(1)[:1]
                rfile, wfile = self.rfile, self.wfile
                if first == b"\x01":
                    creds = sasl_server_handshake(rfile, wfile,
                                                  check=outer.sasl_check)
                    if creds is None:
                        return
                    framed = _FramedIO(rfile, wfile)
                    rfile = wfile = framed
                r = TReader(rfile)
                while True:
                    try:
                        name, mtype, seqid = read_message_header(r)
                    except EOFError:
                        return
                    outer._serve_one(r, wfile, name, seqid)

        class TCP(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._tcp = TCP((self._host, self._port), Handler)
        if self._tls is not None:
            from .tls import wrap_tcp_server

            wrap_tcp_server(self._tcp, self._tls)
        self._thread = threading.Thread(target=self._tcp.serve_forever,
                                        name="hs2-thrift-server", daemon=True)
        self._thread.start()
        return self._tcp.server_address[:2]

    def stop(self):
        if self._tcp is not None:
            self._tcp.shutdown()
            self._tcp.server_close()
            self._tcp = None

    # -- dispatch --

    def _serve_one(self, r: TReader, wfile, name: str, seqid: int):
        spec = METHODS.get(name)
        handler = getattr(self, f"_h_{name}", None)
        if spec is None or handler is None:
            r.skip(T_STRUCT)  # drain the unknown call's args
            write_message(wfile, name, MSG_EXCEPTION, seqid, APP_EXCEPTION[1],
                          {"message": f"unknown method {name!r}", "type": 1})
            return
        args_fields, result_spec = spec
        args = r.struct_(args_fields)
        req = args.get("req") or {}
        self.core.count_rpc(f"hs2.{name}")
        try:
            resp = getattr(self, f"_h_{name}")(req)
        except Exception as e:  # map to TStatus ERROR, keep connection alive
            resp = {"status": _err_status(f"{type(e).__name__}: {e}")}
        write_message(wfile, name, MSG_REPLY, seqid,
                      {0: ("success", result_spec)}, {"success": resp})

    # -- helpers over the shared core --

    def _sess(self, handle: dict):
        sid = _unguid(handle["sessionId"]["guid"])
        return sid, self.core._session({"session": sid})

    def _op(self, handle: dict):
        opid = _unguid(handle["operationId"]["guid"])
        sid = _unguid(handle["operationId"]["secret"])
        _, sess = self._sess({"sessionId": {"guid": _guid(sid)}})
        o = sess.operations.get(opid)
        if o is None:
            raise ValueError(f"unknown operation {opid!r}")
        return sess, opid, o

    @staticmethod
    def _op_handle(sid: str, opid: str, optype: int = OPTYPE_EXECUTE) -> dict:
        # secret carries the owning session id so operation RPCs (which per
        # the IDL carry only the operation handle) can find their session
        return {"operationId": {"guid": _guid(opid), "secret": _guid(sid)},
                "operationType": optype, "hasResultSet": True}

    @staticmethod
    def _wait_done(o, timeout: float = 3600.0):
        # waits until rows are AVAILABLE (window full or EOS) or the
        # operation settled — blocking to end-of-stream would deadlock
        # against a result larger than the bounded fetch window
        if isinstance(o, _AsyncOperation):
            o.wait_fetchable(timeout=timeout)

    # -- RPC handlers --

    def _h_OpenSession(self, req: dict) -> dict:
        resp = self.core._dispatch({"op": "open_session",
                                    "config": req.get("configuration") or {}})
        # negotiate min(server, client) and HONOR it: pre-V6 sessions get
        # row-oriented TRows from FetchResults (a V1-V5 client that trusted
        # the negotiated version cannot parse columnar V6 frames)
        ver = min(PROTOCOL_V6, req.get("client_protocol", PROTOCOL_V6))
        self._proto[resp["session"]] = ver
        return {"status": _ok_status(),
                "serverProtocolVersion": ver,
                "sessionHandle": {"sessionId": {
                    "guid": _guid(resp["session"]), "secret": b"\0" * 16}}}

    def _h_CloseSession(self, req: dict) -> dict:
        sid = _unguid(req["sessionHandle"]["sessionId"]["guid"])
        self.core._dispatch({"op": "close_session", "session": sid})
        self._proto.pop(sid, None)
        return {"status": _ok_status()}

    def _h_ExecuteStatement(self, req: dict) -> dict:
        sid, sess = self._sess(req["sessionHandle"])
        stmt = req.get("statement") or ""
        resp = self.core._dispatch({"op": "execute_async", "session": sid,
                                    "sql": stmt})
        if not req.get("runAsync"):
            # synchronous contract: the RPC returns only when the statement
            # is done, and a failed statement errors HERE (stock sync
            # clients never poll GetOperationStatus)
            o = sess.operations[resp["handle"]]
            self._wait_done(o)
            if isinstance(o, _AsyncOperation) and o.state == "ERROR":
                return {"status": _err_status(o.error or "statement failed")}
        return {"status": _ok_status(),
                "operationHandle": self._op_handle(sid, resp["handle"])}

    def _h_GetOperationStatus(self, req: dict) -> dict:
        _, _, o = self._op(req["operationHandle"])
        if isinstance(o, _AsyncOperation):
            state, err = I2SServer.proto_state(o), o.error
        else:
            state, err = "FINISHED", None
        out = {"status": _ok_status(), "operationState": OP_STATE[state]}
        if err:
            out["errorMessage"] = err
            out["sqlState"] = "HY000"
        return out

    def _h_CancelOperation(self, req: dict) -> dict:
        _, _, o = self._op(req["operationHandle"])
        if isinstance(o, _AsyncOperation):
            o.cancel()
        return {"status": _ok_status()}

    def _h_CloseOperation(self, req: dict) -> dict:
        sess, opid, _ = self._op(req["operationHandle"])
        closing = sess.operations.pop(opid, None)
        if closing is not None:
            closing.close()  # abort a still-draining stream
        return {"status": _ok_status()}

    def _h_GetLog(self, req: dict) -> dict:
        _, _, o = self._op(req["operationHandle"])
        log = o.log_text if isinstance(o, _AsyncOperation) else ""
        return {"status": _ok_status(), "log": log}

    def _h_GetExecSummary(self, req: dict) -> dict:
        """ImpalaHiveServer2Service.GetExecSummary
        (impala-hs2-server.cc:1082): the per-operator TExecSummary tree,
        rendered from the executed plan's metric registry."""
        from .server import exec_summary

        _, _, raw = self._op(req["operationHandle"])
        self._wait_done(raw)
        o = I2SServer._finished(raw)
        return {"status": _ok_status(), "summary": exec_summary(o)}

    def _h_GetRuntimeProfile(self, req: dict) -> dict:
        """ImpalaHiveServer2Service.GetRuntimeProfile — the profile text
        the shell's `profile` command prints, via the HS2 door."""
        _, _, raw = self._op(req["operationHandle"])
        self._wait_done(raw)
        o = I2SServer._finished(raw)
        return {"status": _ok_status(), "profile": o.profile}

    _DELEGATION_MSG = ("Delegation tokens are not supported: this daemon "
                       "does not run kerberized (HiveServer2 rejects these "
                       "calls outside kerberos deployments too)")

    def _h_GetDelegationToken(self, req: dict) -> dict:
        return {"status": _err_status(self._DELEGATION_MSG)}

    def _h_CancelDelegationToken(self, req: dict) -> dict:
        return {"status": _err_status(self._DELEGATION_MSG)}

    def _h_RenewDelegationToken(self, req: dict) -> dict:
        return {"status": _err_status(self._DELEGATION_MSG)}

    def _finished_op(self, handle: dict) -> _Operation:
        _, _, o = self._op(handle)
        self._wait_done(o)
        return I2SServer._finished(o)

    def _h_GetResultSetMetadata(self, req: dict) -> dict:
        o = self._finished_op(req["operationHandle"])
        cols = [{"columnName": c,
                 "typeDesc": {"types": [{"primitiveEntry":
                                         {"type": _type_id(t)}}]},
                 "position": i + 1}
                for i, (c, t) in enumerate(zip(o.columns, o.types))]
        return {"status": _ok_status(), "schema": {"columns": cols}}

    def _h_FetchResults(self, req: dict) -> dict:
        sess, opid, raw = self._op(req["operationHandle"])
        if req.get("fetchType", 0) == 1:  # log stream
            log = raw.log_text if isinstance(raw, _AsyncOperation) else ""
            return {"status": _ok_status(), "hasMoreRows": False,
                    "results": {"startRowOffset": 0, "rows": [],
                                "columns": [_encode_column("string",
                                                           log.splitlines())]}}
        self._wait_done(raw)
        o = I2SServer._finished(raw)
        start = o.pos
        batch, more = o.fetch(int(req.get("maxRows", 1024)))
        sid = _unguid(req["operationHandle"]["operationId"]["secret"])
        if self._proto.get(sid, PROTOCOL_V6) < PROTOCOL_V6:
            # pre-V6: row-oriented TRows (TCLIService.thrift:330), no
            # columnar slots — what the negotiated version promises
            rows = [{"colVals": [_encode_value(t, row[i])
                                 for i, t in enumerate(o.types)]}
                    for row in batch]
            return {"status": _ok_status(), "hasMoreRows": more,
                    "results": {"startRowOffset": start, "rows": rows}}
        cols = [_encode_column(t, [row[i] for row in batch])
                for i, t in enumerate(o.types)]
        return {"status": _ok_status(), "hasMoreRows": more,
                "results": {"startRowOffset": start, "rows": [],
                            "columns": cols}}

    # -- metadata operations: rows come from the shared core, wrapped in a
    #    finished operation fetched like a query result (HS2 contract) --

    def _meta_result(self, sid, sess, resp: dict, optype: int) -> dict:
        o = _Operation(resp["columns"], resp["types"], resp["rows"])
        opid = uuid.uuid4().hex[:12]
        sess.operations[opid] = o
        sess.last_handle = opid
        return {"status": _ok_status(),
                "operationHandle": self._op_handle(sid, opid, optype)}

    def _h_GetSchemas(self, req: dict) -> dict:
        sid, sess = self._sess(req["sessionHandle"])
        resp = self.core._dispatch({
            "op": "get_schemas", "session": sid,
            "schema_pattern": req.get("schemaName") or "%"})
        return self._meta_result(sid, sess, resp, OPTYPE_GET_SCHEMAS)

    def _h_GetTables(self, req: dict) -> dict:
        sid, sess = self._sess(req["sessionHandle"])
        resp = self.core._dispatch({
            "op": "get_tables", "session": sid,
            "table_pattern": req.get("tableName") or "%"})
        return self._meta_result(sid, sess, resp, OPTYPE_GET_TABLES)

    def _h_GetColumns(self, req: dict) -> dict:
        sid, sess = self._sess(req["sessionHandle"])
        resp = self.core._dispatch({
            "op": "get_columns", "session": sid,
            "table": req.get("tableName"),
            "column_pattern": req.get("columnName") or "%"})
        return self._meta_result(sid, sess, resp, OPTYPE_GET_COLUMNS)

    def _h_GetCatalogs(self, req: dict) -> dict:
        # Spark (like Impala) has a single flat catalog: zero rows, like
        # the reference's GetCatalogs (impala-hs2-server.cc returns empty)
        sid, sess = self._sess(req["sessionHandle"])
        return self._meta_result(
            sid, sess, {"columns": ["TABLE_CAT"], "types": ["string"],
                        "rows": []}, 2)

    def _h_GetTableTypes(self, req: dict) -> dict:
        sid, sess = self._sess(req["sessionHandle"])
        return self._meta_result(
            sid, sess, {"columns": ["TABLE_TYPE"], "types": ["string"],
                        "rows": [["TABLE"], ["VIEW"]]}, 5)

    def _h_GetTypeInfo(self, req: dict) -> dict:
        sid, sess = self._sess(req["sessionHandle"])
        types = ["BOOLEAN", "TINYINT", "SMALLINT", "INT", "BIGINT", "FLOAT",
                 "DOUBLE", "STRING", "TIMESTAMP", "BINARY", "DECIMAL",
                 "DATE", "VARCHAR", "CHAR"]
        rows = [[t, _type_id(t.lower())] for t in types]
        return self._meta_result(
            sid, sess, {"columns": ["TYPE_NAME", "DATA_TYPE"],
                        "types": ["string", "int"], "rows": rows}, 1)

    def _h_GetFunctions(self, req: dict) -> dict:
        sid, sess = self._sess(req["sessionHandle"])
        pat = (req.get("functionName") or "%").replace("%", "*")
        rows = [["", "", f.name, "", 0, ""] for f in
                sess.spark.catalog.listFunctions(pattern=pat)]
        rows.sort(key=lambda r: r[2])
        return self._meta_result(
            sid, sess,
            {"columns": ["FUNCTION_CAT", "FUNCTION_SCHEM", "FUNCTION_NAME",
                         "REMARKS", "FUNCTION_TYPE", "SPECIFIC_NAME"],
             "types": ["string", "string", "string", "string", "int",
                       "string"], "rows": rows}, 7)

    def _h_GetInfo(self, req: dict) -> dict:
        t = req.get("infoType")
        if t == INFO_CLI_SERVER_NAME or t == INFO_CLI_DBMS_NAME:
            val = {"stringValue": "impalatogo-spark"}
        elif t == INFO_CLI_DBMS_VER:
            val = {"stringValue": self.core._spark.version}
        else:
            val = {"lenValue": 0}
        return {"status": _ok_status(), "infoValue": val}


# ---------------------------------------------------------------------------
# client (a stock TCLIService client hand-rolled from the same public IDL;
# committed per the parity contract so pytest drives the daemon over real
# thrift frames end-to-end)
# ---------------------------------------------------------------------------

class HS2ThriftClient:
    def __init__(self, host: str, port: int, timeout: float = 300.0,
                 sasl_plain: tuple[str, str] | None = None,
                 tls: bool | str = False):
        """tls: False = plaintext, True = TLS without verification
        (impala-shell --ssl default), a path = CA bundle to verify against
        (--ca_cert)."""
        self._sock = socket.create_connection((host, port), timeout=timeout)
        if tls:
            from .tls import wrap_client_socket

            self._sock = wrap_client_socket(
                self._sock, ca_file=tls if isinstance(tls, str) else None)
        self._rfile = self._sock.makefile("rb")
        self._wfile = self._sock.makefile("wb")
        if sasl_plain is not None:
            sasl_client_handshake(self._rfile, self._wfile, *sasl_plain)
            framed = _FramedIO(self._rfile, self._wfile)
            self._rfile = self._wfile = framed
        self._r = TReader(self._rfile)
        self._seq = 0
        self.session_handle: dict | None = None

    def call(self, method: str, req: dict) -> dict:
        args_fields, result_spec = METHODS[method]
        self._seq += 1
        w = TWriter()
        w.i32(_VERSION_1 | MSG_CALL)
        w.string(method)
        w.i32(self._seq)
        w.struct_(args_fields, {"req": req})
        self._wfile.write(bytes(w.buf))
        self._wfile.flush()
        name, mtype, seqid = read_message_header(self._r)
        if mtype == MSG_EXCEPTION:
            exc = self._r.struct_(APP_EXCEPTION[1])
            raise RuntimeError(f"TApplicationException: {exc.get('message')}")
        result = self._r.struct_({0: ("success", result_spec)})
        resp = result.get("success") or {}
        status = resp.get("status") or {}
        if status.get("statusCode") == STATUS_ERROR:
            raise RuntimeError(status.get("errorMessage") or "HS2 error")
        return resp

    # -- convenience surface mirroring a stock HS2 client --

    def open_session(self, configuration: dict | None = None,
                     client_protocol: int = PROTOCOL_V6) -> dict:
        resp = self.call("OpenSession", {
            "client_protocol": client_protocol, "username": "pytest",
            "password": "", "configuration": configuration or {}})
        self.session_handle = resp["sessionHandle"]
        return resp

    def execute(self, sql: str, run_async: bool = False) -> dict:
        resp = self.call("ExecuteStatement", {
            "sessionHandle": self.session_handle, "statement": sql,
            "runAsync": run_async})
        return resp["operationHandle"]

    def status(self, op: dict) -> tuple[str, str | None]:
        resp = self.call("GetOperationStatus", {"operationHandle": op})
        inv = {v: k for k, v in OP_STATE.items()}
        return (inv.get(resp.get("operationState"), "UNKNOWN"),
                resp.get("errorMessage"))

    def wait(self, op: dict, timeout: float = 300.0) -> str:
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            state, err = self.status(op)
            if state not in ("INITIALIZED", "RUNNING", "PENDING"):
                if state == "ERROR":
                    raise RuntimeError(err or "operation failed")
                return state
            time.sleep(0.05)
        raise TimeoutError("operation did not finish in time")

    def schema(self, op: dict) -> list[tuple[str, int]]:
        resp = self.call("GetResultSetMetadata", {"operationHandle": op})
        return [(c["columnName"],
                 c["typeDesc"]["types"][0]["primitiveEntry"]["type"])
                for c in resp["schema"]["columns"]]

    def fetch(self, op: dict, max_rows: int = 1024) -> tuple[list, bool]:
        resp = self.call("FetchResults", {
            "operationHandle": op, "orientation": 0, "maxRows": max_rows})
        cols = [decode_column(c)
                for c in (resp.get("results") or {}).get("columns") or []]
        rows = [list(t) for t in zip(*cols)] if cols and cols[0] else []
        return rows, bool(resp.get("hasMoreRows"))

    def fetch_all(self, op: dict, max_rows: int = 1024) -> list:
        rows, more = self.fetch(op, max_rows)
        while more:
            batch, more = self.fetch(op, max_rows)
            rows.extend(batch)
        return rows

    def cancel(self, op: dict) -> None:
        self.call("CancelOperation", {"operationHandle": op})

    def get_log(self, op: dict) -> str:
        return self.call("GetLog", {"operationHandle": op}).get("log", "")

    def close_operation(self, op: dict) -> None:
        self.call("CloseOperation", {"operationHandle": op})

    def close(self) -> None:
        try:
            if self.session_handle is not None:
                self.call("CloseSession",
                          {"sessionHandle": self.session_handle})
        finally:
            try:
                self._sock.close()
            except OSError:
                pass
