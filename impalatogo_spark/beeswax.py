"""Beeswax wire protocol: the reference's second front door.

Reference parity: impala-shell and legacy clients speak BeeswaxService /
ImpalaService (`be/src/service/impala-beeswax-server.cc:170` query/fetch,
`:434` Cancel; the IDL is the public Apache Hive beeswax.thrift plus
Impala's ImpalaService extension). Served here over the same hand-rolled
binary-Thrift codec as thrift_hs2.py, in front of the same
session/engine/admission core.

Protocol notes (all public-IDL semantics):
  * no session handles — a Beeswax session is the CONNECTION (one core
    session per TCP connection, opened lazily, closed on disconnect);
  * `query` returns a QueryHandle immediately (async — the reference
    coordinator runs the statement in the background; get_state polls),
    `executeAndWait` blocks;
  * `fetch` returns rows as TAB-DELIMITED strings (Results.data), with
    start_over rewinding to row 0;
  * `get_results_metadata` exposes the hive_metastore-style FieldSchema
    list; `explain` returns the plan text; Impala extensions `Cancel` and
    `GetRuntimeProfile` map to the async cancel and profile readouts.
"""

from __future__ import annotations

import socketserver
import threading
import uuid

from .server import I2SServer, _AsyncOperation
from .thrift_hs2 import (APP_EXCEPTION, EXEC_SUMMARY, IMPALA_T_STATUS,
                         MSG_EXCEPTION, MSG_REPLY, TReader, TWriter,
                         T_STRUCT, _VERSION_1, _FramedIO,
                         read_message_header, sasl_server_handshake,
                         write_message)

# -- beeswax.thrift structs (public Apache Hive IDL) -------------------------

QUERY = ("struct", {1: ("query", "str"),
                    3: ("configuration", ("list", "str")),
                    4: ("hadoop_user", "str")})
QUERY_HANDLE = ("struct", {1: ("id", "str"), 2: ("log_context", "str")})
QUERY_EXPLANATION = ("struct", {1: ("textual", "str")})
RESULTS = ("struct", {1: ("ready", "bool"),
                      2: ("columns", ("list", "str")),
                      3: ("data", ("list", "str")),
                      4: ("start_row", "i64"), 5: ("has_more", "bool")})
FIELD_SCHEMA = ("struct", {1: ("name", "str"), 2: ("type", "str"),
                           3: ("comment", "str")})
SCHEMA = ("struct", {1: ("fieldSchemas", ("list", FIELD_SCHEMA)),
                     2: ("properties", ("map", "str", "str"))})
RESULTS_METADATA = ("struct", {1: ("schema", SCHEMA), 2: ("table_dir", "str"),
                               3: ("in_tablename", "str"), 4: ("delim", "str")})
CONFIG_VARIABLE = ("struct", {1: ("key", "str"), 2: ("value", "str"),
                              3: ("description", "str")})
# ImpalaService.thrift TInsertResult / Status.thrift TStatus; the
# ExecStats.thrift summary structs are shared with the HS2 door
INSERT_RESULT = ("struct", {1: ("rows_appended", ("map", "str", "i64"))})
T_STATUS = IMPALA_T_STATUS
RESET_TABLE_REQ = ("struct", {1: ("db_name", "str"),
                              2: ("table_name", "str")})
# QueryState enum (beeswax.thrift): CREATED=0 INITIALIZED=1 COMPILED=2
# RUNNING=3 FINISHED=4 EXCEPTION=5
_QSTATE = {"INITIALIZED": 1, "RUNNING": 3, "FINISHED": 4, "CANCELED": 5,
           "ERROR": 5}

METHODS = {
    "query": ({1: ("query", QUERY)}, QUERY_HANDLE),
    "executeAndWait": ({1: ("query", QUERY), 2: ("clientCtx", "str")},
                       QUERY_HANDLE),
    "explain": ({1: ("query", QUERY)}, QUERY_EXPLANATION),
    "fetch": ({1: ("query_id", QUERY_HANDLE), 2: ("start_over", "bool"),
               3: ("fetch_size", "i32")}, RESULTS),
    "get_state": ({1: ("handle", QUERY_HANDLE)}, "i32"),
    "get_results_metadata": ({1: ("handle", QUERY_HANDLE)},
                             RESULTS_METADATA),
    "echo": ({1: ("s", "str")}, "str"),
    "get_log": ({1: ("context", "str")}, "str"),
    "close": ({1: ("handle", QUERY_HANDLE)}, None),
    "clean": ({1: ("log_context", "str")}, None),
    # the connect-time RPC the stock impala-shell cannot finish a session
    # without (shell/impala_client.py:84 build_default_query_options_dict)
    "get_default_configuration": ({1: ("include_hadoop", "bool")},
                                  ("list", CONFIG_VARIABLE)),
    "dump_config": ({}, "str"),
    # ImpalaService extensions (ImpalaService.thrift)
    "Cancel": ({1: ("query_id", QUERY_HANDLE)}, T_STATUS),
    "ResetCatalog": ({}, T_STATUS),
    "ResetTable": ({1: ("request", RESET_TABLE_REQ)}, T_STATUS),
    "GetRuntimeProfile": ({1: ("query_id", QUERY_HANDLE)}, "str"),
    "CloseInsert": ({1: ("handle", QUERY_HANDLE)}, INSERT_RESULT),
    "PingImpalaService": ({}, None),
    "GetExecSummary": ({1: ("handle", QUERY_HANDLE)}, EXEC_SUMMARY),
}


def _tsv(row: list) -> str:
    return "\t".join("NULL" if v is None else str(v) for v in row)


class BeeswaxServer:
    """BeeswaxService/ImpalaService daemon over a shared I2SServer core."""

    def __init__(self, spark, sf_dir: str | None = None,
                 host: str = "127.0.0.1", port: int = 0,
                 core: I2SServer | None = None, sasl_check=None, tls=None):
        self.core = core or I2SServer(spark, sf_dir=sf_dir)
        self._host, self._port = host, port
        self._tcp = None
        self._thread = None
        # optional PLAIN authenticator (user, password) -> bool, same
        # contract as HS2ThriftServer.sasl_check (e.g. auth.LdapAuthenticator)
        self.sasl_check = sasl_check
        # optional tls.TlsConfig (thrift-server.cc EnableSsl)
        self._tls = tls

    def start(self) -> tuple[str, int]:
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                # same per-connection transport auto-detection as the HS2
                # port: a SASL START byte (0x01) cannot open a raw thrift
                # message, so one port serves NOSASL and SASL-PLAIN
                rfile, wfile = self.rfile, self.wfile
                if self.rfile.peek(1)[:1] == b"\x01":
                    if sasl_server_handshake(rfile, wfile,
                                             check=outer.sasl_check) is None:
                        return
                    framed = _FramedIO(rfile, wfile)
                    rfile = wfile = framed
                r = TReader(rfile)
                sid = None
                try:
                    while True:
                        try:
                            name, mtype, seqid = read_message_header(r)
                        except EOFError:
                            return
                        if sid is None:  # lazy per-connection session
                            sid = outer.core._dispatch(
                                {"op": "open_session"})["session"]
                        outer._serve_one(r, wfile, name, seqid, sid)
                finally:
                    if sid is not None:
                        outer.core._dispatch(
                            {"op": "close_session", "session": sid})

        class TCP(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._tcp = TCP((self._host, self._port), Handler)
        if self._tls is not None:
            from .tls import wrap_tcp_server

            wrap_tcp_server(self._tcp, self._tls)
        self._thread = threading.Thread(target=self._tcp.serve_forever,
                                        name="beeswax-server", daemon=True)
        self._thread.start()
        return self._tcp.server_address[:2]

    def stop(self):
        if self._tcp is not None:
            self._tcp.shutdown()
            self._tcp.server_close()
            self._tcp = None

    # -- dispatch --

    def _serve_one(self, r: TReader, wfile, name: str, seqid: int, sid: str):
        spec = METHODS.get(name)
        handler = getattr(self, f"_h_{name}", None)
        if spec is None or handler is None:
            r.skip(T_STRUCT)
            write_message(wfile, name, MSG_EXCEPTION, seqid, APP_EXCEPTION[1],
                          {"message": f"unknown method {name!r}", "type": 1})
            return
        args_fields, result_spec = spec
        args = r.struct_(args_fields)
        self.core.count_rpc(f"beeswax.{name}")
        try:
            resp = handler(sid, args)
        except Exception as e:
            # BeeswaxException would need its declared exception slot; a
            # TApplicationException is the conservative cross-client signal
            write_message(wfile, name, MSG_EXCEPTION, seqid, APP_EXCEPTION[1],
                          {"message": f"{type(e).__name__}: {e}", "type": 6})
            return
        result_fields = {} if result_spec is None else \
            {0: ("success", result_spec)}
        values = {} if result_spec is None else {"success": resp}
        write_message(wfile, name, MSG_REPLY, seqid, result_fields, values)

    def _sess(self, sid: str):
        return self.core._session({"session": sid})

    def _op(self, sid: str, handle: dict):
        sess = self._sess(sid)
        o = sess.operations.get((handle or {}).get("id"))
        if o is None:
            raise ValueError("unknown query handle")
        return sess, o

    @staticmethod
    def _finished(o):
        if isinstance(o, _AsyncOperation):
            o.wait_fetchable(timeout=3600)  # rows available, not EOS
        return I2SServer._finished(o)

    # -- handlers --

    def _h_query(self, sid: str, args: dict) -> dict:
        q = args.get("query") or {}
        resp = self.core._dispatch({"op": "execute_async", "session": sid,
                                    "sql": q.get("query") or ""})
        return {"id": resp["handle"], "log_context": resp["handle"]}

    def _h_executeAndWait(self, sid: str, args: dict) -> dict:
        out = self._h_query(sid, args)
        _, o = self._op(sid, {"id": out["id"]})
        self._finished(o)
        return out

    def _h_explain(self, sid: str, args: dict) -> dict:
        q = (args.get("query") or {}).get("query") or ""
        sess = self._sess(sid)
        return {"textual": sess.engine.explain(q)}

    def _h_fetch(self, sid: str, args: dict) -> dict:
        _, raw = self._op(sid, args.get("query_id"))
        o = self._finished(raw)
        if args.get("start_over"):
            o.start_over()  # streaming results past the window refuse this
        start = o.pos
        n = args.get("fetch_size") or 1024
        if n < 0:
            n = 1024
        batch, more = o.fetch(n)
        return {"ready": True, "columns": list(o.columns),
                "data": [_tsv(row) for row in batch],
                "start_row": start, "has_more": more}

    def _h_get_state(self, sid: str, args: dict) -> int:
        _, o = self._op(sid, args.get("handle"))
        return _QSTATE.get(I2SServer.proto_state(o), 5)

    def _h_get_results_metadata(self, sid: str, args: dict) -> dict:
        _, raw = self._op(sid, args.get("handle"))
        o = self._finished(raw)
        return {"schema": {"fieldSchemas": [
            {"name": c, "type": t} for c, t in zip(o.columns, o.types)]},
            "delim": "\t"}

    def _h_echo(self, sid: str, args: dict) -> str:
        return args.get("s") or ""

    def _h_get_default_configuration(self, sid: str, args: dict) -> list:
        """beeswax.thrift get_default_configuration — the stock
        impala-shell calls this during connect to seed its query-option
        table; without it the shell cannot finish connecting."""
        sess = self._sess(sid)
        return [{"key": k, "value": v, "description": d}
                for k, v, d in sess.engine.default_configuration()]

    def _h_dump_config(self, sid: str, args: dict) -> str:
        return self._sess(sid).engine.dump_config()

    def _h_ResetCatalog(self, sid: str, args: dict) -> dict:
        """ImpalaService.ResetCatalog (deprecated alias of INVALIDATE
        METADATA, impala-beeswax-server.cc:503)."""
        self._sess(sid).engine.sql("INVALIDATE METADATA")
        return {"status_code": 0}

    def _h_ResetTable(self, sid: str, args: dict) -> dict:
        """ImpalaService.ResetTable (deprecated alias of REFRESH <table>,
        impala-beeswax-server.cc:507)."""
        req = args.get("request") or {}
        db, tbl = req.get("db_name") or "", req.get("table_name") or ""
        name = f"{db}.{tbl}" if db and db != "default" else tbl
        if not tbl:
            raise ValueError("ResetTable requires a table name")
        self._sess(sid).engine.sql(f"REFRESH {name}")
        return {"status_code": 0}

    def _h_CloseInsert(self, sid: str, args: dict) -> dict:
        """ImpalaService.CloseInsert (impala-beeswax-server.cc:446): close
        the DML handle and return TInsertResult.rows_appended. Spark's
        write command reports the total written row count (per-partition
        counters aren't exposed), keyed by the root partition '' exactly as
        the reference does for unpartitioned sinks — the shell sums the
        map's values either way."""
        sess = self._sess(sid)
        handle = (args.get("handle") or {}).get("id")
        raw = sess.operations.get(handle)
        if raw is None:
            raise ValueError("unknown query handle")
        o = self._finished(raw)
        done = getattr(o, "done", None)
        if done is not None:  # streaming: the write count lands at EOS
            done.wait(timeout=3600)
        rows = getattr(o, "dml_rows", None)
        sess.operations.pop(handle, None)
        return {"rows_appended": {"": int(rows or 0)}}

    def _h_GetExecSummary(self, sid: str, args: dict) -> dict:
        """ImpalaService.GetExecSummary (impala-beeswax-server.cc:481) —
        the per-operator TExecSummary tree the shell's `summary` command
        renders, built from the executed plan's metric registry."""
        from .server import exec_summary

        _, raw = self._op(sid, args.get("handle"))
        o = self._finished(raw)
        return exec_summary(o)

    def _h_get_log(self, sid: str, args: dict) -> str:
        sess = self._sess(sid)
        o = sess.operations.get(args.get("context"))
        return o.log_text if isinstance(o, _AsyncOperation) else ""

    def _h_close(self, sid: str, args: dict):
        sess = self._sess(sid)
        closing = sess.operations.pop((args.get("handle") or {}).get("id"),
                                      None)
        if closing is not None:
            closing.close()  # abort a still-draining stream
        return None

    def _h_clean(self, sid: str, args: dict):
        return None

    def _h_Cancel(self, sid: str, args: dict) -> dict:
        _, o = self._op(sid, args.get("query_id"))
        if isinstance(o, _AsyncOperation):
            o.cancel()
        return {"status_code": 0}

    def _h_GetRuntimeProfile(self, sid: str, args: dict) -> str:
        _, raw = self._op(sid, args.get("query_id"))
        o = self._finished(raw)
        return o.profile

    def _h_PingImpalaService(self, sid: str, args: dict):
        return None


class BeeswaxClient:
    """Minimal BeeswaxService client over the shared codec (the committed
    test driver; the reference analogue is impala-shell's beeswax mode)."""

    def __init__(self, host: str, port: int, timeout: float = 300.0,
                 sasl_plain: tuple[str, str] | None = None,
                 tls: bool | str = False):
        """tls: False = plaintext, True = TLS unverified (impala-shell
        --ssl default), a path = CA bundle to verify (--ca_cert)."""
        import socket

        from .thrift_hs2 import sasl_client_handshake

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

    def call(self, method: str, **kwargs):
        args_fields, result_spec = METHODS[method]
        self._seq += 1
        w = TWriter()
        w.i32(_VERSION_1 | 1)  # CALL
        w.string(method)
        w.i32(self._seq)
        w.struct_(args_fields, kwargs)
        self._wfile.write(bytes(w.buf))
        self._wfile.flush()
        name, mtype, seqid = read_message_header(self._r)
        if mtype == MSG_EXCEPTION:
            exc = self._r.struct_(APP_EXCEPTION[1])
            raise RuntimeError(exc.get("message") or "beeswax error")
        fields = {} if result_spec is None else {0: ("success", result_spec)}
        result = self._r.struct_(fields)
        return result.get("success")

    def query(self, sql: str) -> dict:
        return self.call("query", query={"query": sql})

    def wait(self, handle: dict, timeout: float = 300.0) -> int:
        import time

        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            st = self.call("get_state", handle=handle)
            if st in (4, 5):
                return st
            time.sleep(0.05)
        raise TimeoutError("query did not finish")

    def fetch_all(self, handle: dict, fetch_size: int = 1024) -> list[str]:
        rows: list[str] = []
        more = True
        while more:
            res = self.call("fetch", query_id=handle, start_over=False,
                            fetch_size=fetch_size)
            rows.extend(res.get("data") or [])
            more = bool(res.get("has_more"))
        return rows

    def close(self):
        try:
            self._sock.close()
        except OSError:
            pass
