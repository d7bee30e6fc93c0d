"""Network front door: an HS2-equivalent SQL service over TCP.

Reference parity: the reference engine is a network daemon first — clients
speak HiveServer2 (`be/src/service/impala-hs2-server.cc:442`
ExecuteStatement/FetchResults/OpenSession) or Beeswax
(`be/src/service/impala-beeswax-server.cc:170` query/fetch) to impalad,
and every session carries its own query options, database, and in-flight
operation handles (`be/src/service/impala-server.h` SessionState /
QueryExecState).

Spark-native mapping (no Thrift dependency in this container — the wire
format is newline-delimited JSON, one request/response object per line,
deliberately mirroring HS2's RPC surface):

  open_session   -> OpenSession: allocates a session backed by
                    `spark.newSession()` — an isolated SparkSession sharing
                    the SparkContext but with its OWN SQL conf, temp views
                    and UDFs, which is exactly HS2's per-session contract —
                    plus an Engine for dialect SQL / SET options.
  execute        -> ExecuteStatement (+ first FetchResults batch inline):
                    runs Impala-dialect SQL, returns an operation handle,
                    column names/types, and up to `fetch` rows.
  fetch          -> FetchResults: paginated continuation.
  profile        -> GetRuntimeProfile: the executed plan's per-operator
                    metrics tree (plans.profile_text).
  explain        -> the reference's Explain() endpoint.
  close_operation/close_session/ping -> their HS2 namesakes.

Admission control (`be/src/scheduling/admission-controller.cc`): every
execute is admitted into the session's REQUEST_POOL through
admission.AdmissionController — admitted / FIFO-queued / rejected per the
pool's MAX_REQUESTS / MAX_QUEUED / QUEUE_TIMEOUT_MS (all settable via SET,
like the reference's pool config + REQUEST_POOL option). `admission_stats`
is the /admission debug-endpoint readout.

Scale notes: the server is a thin driver-side layer — each statement runs
on the connection's thread against the shared SparkContext, so N clients
get Spark's normal FAIR-scheduler concurrency (see tests/test_concurrency).
Result buffering is bounded by the client's fetch pagination, not by
row-count materialization on the wire.
"""

from __future__ import annotations

import base64
import datetime
import decimal
import json
import socket
import socketserver
import threading
import uuid

from pyspark.sql import SparkSession

from .admission import (AdmissionController, AdmissionRejected,
                        AdmissionTimeout)
from .engine import Engine
from .session import ensure_session_confs, register_tables

# SET keys consumed by the admission layer (pool config), applied to the
# session's current REQUEST_POOL.
_ADMISSION_KEYS = ("MAX_REQUESTS", "MAX_QUEUED", "QUEUE_TIMEOUT_MS",
                   "MAX_MEM_RESOURCES")


def _parse_mem(value) -> int:
    """Impala memory-option syntax -> bytes: plain ints are bytes; b/k/m/g
    suffixes scale, with an optional trailing 'b' after the multiplier so
    '2GB'/'512MB' parse like the reference's ParseMemSpec
    (be/src/util/parse-util.cc strips the 'B' before applying g/m/k)."""
    s = str(value or "0").strip().lower()
    if not s:
        return 0
    mult = 1
    if s[-1] == "b" and len(s) >= 2 and s[-2] in "kmg":
        s = s[:-1]
    if s[-1] in "bkmg":
        mult = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30}[s[-1]]
        s = s[:-1]
    try:
        return int(float(s) * mult)
    except ValueError:
        raise ValueError(
            f"invalid memory specification {value!r}: expected "
            "<number>[B|KB|MB|GB]") from None


def _json_val(v):
    """Make a row value JSON-safe while keeping it faithful enough for a
    shell: temporal -> ISO strings, Decimal -> str (no precision loss),
    bytes -> base64, nested arrays/maps/structs -> recursed containers."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, dict):
        return {str(k): _json_val(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_json_val(x) for x in v]
    if hasattr(v, "asDict"):  # pyspark Row (struct)
        return {k: _json_val(x) for k, x in v.asDict().items()}
    return str(v)


def _sql_pattern(pat: str):
    """HS2/JDBC metadata pattern -> compiled regex (% = any run, _ = one
    char, backslash escapes the next char, everything else literal)."""
    import re

    out, i = [], 0
    pat = pat or "%"
    while i < len(pat):
        ch = pat[i]
        if ch == "\\" and i + 1 < len(pat):
            out.append(re.escape(pat[i + 1]))
            i += 2
            continue
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
        i += 1
    return re.compile("".join(out))


class _Operation:
    """A finished statement's buffered result — the QueryExecState analogue
    (rows are materialized at execute time, like the reference coordinator's
    result cache; fetch() paginates)."""

    def __init__(self, columns, types, rows, profile=""):
        self.columns = columns
        self.types = types
        self.rows = rows
        self.profile = profile
        self.pos = 0
        self.elapsed = 0.0

    def fetch(self, max_rows: int):
        batch = self.rows[self.pos:self.pos + max_rows]
        self.pos += len(batch)
        return batch, self.pos < len(self.rows)


class OperationCancelled(Exception):
    """Raised inside a worker when a client cancelled its operation
    (CancelOperation, impala-hs2-server.cc:915 / Beeswax Cancel,
    impala-beeswax-server.cc:434)."""


class _AsyncOperation:
    """An in-flight statement with the reference's operation lifecycle
    (impala-hs2-server.cc:884 GetOperationStatus / :915 CancelOperation /
    :1048 GetLog): ExecuteStatement returns this handle immediately, the
    statement runs on a worker thread inside its own Spark job group, and
    the client polls status / fetches once FINISHED / cancels mid-flight
    (cancelJobGroup is the proven EXEC_TIME_LIMIT_S plumbing)."""

    def __init__(self, sc, label: str):
        import time as _time

        self._sc = sc
        self.label = label
        self.group = f"i2s-async-{uuid.uuid4().hex[:8]}"
        self.state = "INITIALIZED"
        self.error: str | None = None
        self.result: _Operation | None = None
        self.cancel_requested = threading.Event()
        self.done = threading.Event()
        self._t0 = _time.monotonic()
        self._log: list[str] = []
        self._lock = threading.Lock()
        self.log_line(f"operation created: {label!r}")

    def log_line(self, msg: str) -> None:
        import time as _time

        with self._lock:
            self._log.append(f"[{_time.monotonic() - self._t0:8.3f}s] {msg}")

    @property
    def log_text(self) -> str:
        with self._lock:
            return "\n".join(self._log)

    def cancel(self) -> None:
        """Client-initiated cancel: flag first (so the worker maps the Spark
        job failure to CANCELED, not ERROR), then kill the job group —
        repeatedly, because cancelJobGroup only hits jobs ALREADY running:
        a cancel landing between statement planning and the first job launch
        would otherwise be lost and the statement would run to completion."""
        if self.done.is_set():
            return
        self.cancel_requested.set()
        self.log_line("cancel requested by client")

        def _reaper():
            while not self.done.wait(timeout=0.2):
                try:
                    self._sc.cancelJobGroup(self.group)
                except Exception:
                    return

        self._sc.cancelJobGroup(self.group)
        threading.Thread(target=_reaper, name=f"{self.group}-reaper",
                         daemon=True).start()

    def run(self, fn) -> None:
        """Execute fn() on a worker thread; fn returns the finished
        _Operation-shaped response dict."""

        def _worker():
            self.state = "RUNNING"
            self.log_line("statement started")
            try:
                self.result = fn()
                if self.cancel_requested.is_set():
                    self.state = "CANCELED"
                    self.log_line("finished after cancel request")
                else:
                    self.state = "FINISHED"
                    self.log_line(
                        f"finished: {len(self.result.rows)} row(s) buffered")
            except OperationCancelled:
                self.state = "CANCELED"
                self.log_line("cancelled")
            except BaseException as e:
                if self.cancel_requested.is_set():
                    self.state = "CANCELED"
                    self.log_line("cancelled")
                else:
                    self.state = "ERROR"
                    self.error = f"{type(e).__name__}: {e}"
                    self.log_line(f"error: {self.error}")
            finally:
                self.done.set()

        t = threading.Thread(
            target=_worker, name=f"i2s-op-{self.group}", daemon=True
        )
        t.start()


class _Session:
    def __init__(self, spark: SparkSession, sf_dir: str | None):
        import time as _time

        self.spark = spark.newSession()
        ensure_session_confs(self.spark)
        if sf_dir:
            register_tables(self.spark, sf_dir)
        self.engine = Engine(self.spark)
        self.operations: dict[str, _Operation] = {}
        self.last_handle: str | None = None
        self.last_used = _time.monotonic()

    @property
    def pool(self) -> str:
        return self.engine.options.get("REQUEST_POOL") or "default"


class SessionExpired(Exception):
    """The reference's idle-session expiration (impala-server.cc
    --idle_session_timeout): a session untouched past the timeout is
    closed server-side; subsequent use gets this error."""


class I2SServer:
    """Threaded TCP server; `start()` binds and serves in the background.

    idle_session_timeout_s mirrors the reference daemon's
    --idle_session_timeout flag (impala-server.cc ExpireSessions): sessions
    idle past the limit are reaped lazily at dispatch time (no reaper
    thread needed — an expired session is indistinguishable from a reaped
    one until someone touches it)."""

    def __init__(self, spark: SparkSession, sf_dir: str | None = None,
                 host: str = "127.0.0.1", port: int = 0,
                 idle_session_timeout_s: float | None = None):
        self._spark = spark
        self._sf_dir = sf_dir
        self._host = host
        self._port = port
        self._sessions: dict[str, _Session] = {}
        self._lock = threading.Lock()
        self.admission = AdmissionController()
        self.idle_session_timeout_s = idle_session_timeout_s
        self._tcp: socketserver.ThreadingTCPServer | None = None
        self._thread: threading.Thread | None = None
        # query registry for the debug webserver (/queries,
        # impala-server.cc RegisterWebserverCallbacks: in-flight +
        # completed-query log, bounded like --query_log_size)
        import collections

        self.query_log = collections.deque(maxlen=200)
        self._inflight: dict[int, dict] = {}
        self._query_seq = 0
        self.queries_completed = 0

    # -- lifecycle -----------------------------------------------------------

    def start(self) -> tuple[str, int]:
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                for raw in self.rfile:
                    line = raw.decode("utf-8", errors="replace").strip()
                    if not line:
                        continue
                    try:
                        req = json.loads(line)
                        resp = outer._dispatch(req)
                    except (AdmissionRejected, AdmissionTimeout) as e:
                        resp = {"ok": False, "error": str(e),
                                "error_class": type(e).__name__}
                    except Exception as e:  # per-request fault isolation
                        resp = {"ok": False, "error": str(e),
                                "error_class": type(e).__name__}
                    self.wfile.write(
                        (json.dumps(resp, default=str) + "\n").encode("utf-8")
                    )
                    self.wfile.flush()

        class TCP(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._tcp = TCP((self._host, self._port), Handler)
        self._thread = threading.Thread(
            target=self._tcp.serve_forever, name="i2s-server", daemon=True
        )
        self._thread.start()
        return self._tcp.server_address[:2]

    def stop(self) -> None:
        if self._tcp is not None:
            self._tcp.shutdown()
            self._tcp.server_close()
            self._tcp = None

    # -- dispatch ------------------------------------------------------------

    def _session(self, req) -> _Session:
        import time as _time

        sid = req.get("session")
        with self._lock:
            if self.idle_session_timeout_s is not None:
                now = _time.monotonic()
                for k in [k for k, s in self._sessions.items()
                          if now - s.last_used > self.idle_session_timeout_s]:
                    del self._sessions[k]
                    if k == sid:
                        raise SessionExpired(
                            f"session {sid!r} expired after "
                            f"{self.idle_session_timeout_s}s idle"
                        )
            sess = self._sessions.get(sid)
            if sess is not None:
                sess.last_used = _time.monotonic()
        if sess is None:
            raise ValueError(f"unknown session: {sid!r}")
        return sess

    def _dispatch(self, req: dict) -> dict:
        op = req.get("op")
        if op == "ping":
            return {"ok": True, "server": "i2s-server",
                    "spark_version": self._spark.version,
                    "sessions": len(self._sessions)}
        if op == "open_session":
            sess = _Session(self._spark, req.get("sf_dir") or self._sf_dir)
            for k, v in (req.get("config") or {}).items():
                sess.engine.set(k, v)
            sid = uuid.uuid4().hex[:12]
            with self._lock:
                self._sessions[sid] = sess
            return {"ok": True, "session": sid,
                    "spark_version": self._spark.version}
        if op == "close_session":
            with self._lock:
                self._sessions.pop(req.get("session"), None)
            return {"ok": True}
        if op == "admission_stats":
            return {"ok": True, "pools": self.admission.stats()}

        sess = self._session(req)
        if op == "execute":
            return self._execute(sess, req)
        if op == "execute_async":
            return self._execute_async(sess, req)
        if op == "operation_status":
            o = self._resolve(sess, req)
            if isinstance(o, _AsyncOperation):
                return {"ok": True, "state": o.state, "error": o.error,
                        "row_count": (len(o.result.rows)
                                      if o.result is not None else None)}
            return {"ok": True, "state": "FINISHED", "error": None,
                    "row_count": len(o.rows)}
        if op == "cancel_operation":
            o = self._resolve(sess, req)
            if isinstance(o, _AsyncOperation):
                o.cancel()
                return {"ok": True, "state": o.state}
            return {"ok": True, "state": "FINISHED"}  # already done
        if op == "get_log":
            o = self._resolve(sess, req)
            log = o.log_text if isinstance(o, _AsyncOperation) else ""
            return {"ok": True, "log": log}
        if op == "fetch":
            o = self._finished(self._resolve(sess, req))
            rows, more = o.fetch(int(req.get("max_rows", 1024)))
            return {"ok": True, "rows": rows, "has_more": more}
        if op == "profile":
            o = self._finished(self._resolve(sess, req))
            return {"ok": True, "profile": o.profile}
        if op == "explain":
            return {"ok": True, "plan": sess.engine.explain(req["sql"])}
        if op == "close_operation":
            sess.operations.pop(req.get("handle"), None)
            return {"ok": True}
        # HS2 metadata RPCs (GetSchemas / GetTables / GetColumns —
        # TCLIService; the reference serves these from its catalog,
        # impala-hs2-server.cc GetSchemas/GetTables/GetColumns). Patterns
        # use the HS2/JDBC convention: % = any, _ = one char.
        if op == "get_schemas":
            pat = _sql_pattern(req.get("schema_pattern", "%"))
            rows = [[d.name] for d in sess.spark.catalog.listDatabases()
                    if pat.fullmatch(d.name)]
            return {"ok": True, "columns": ["TABLE_SCHEM"],
                    "types": ["string"], "rows": rows, "has_more": False}
        if op == "get_tables":
            pat = _sql_pattern(req.get("table_pattern", "%"))
            rows = [
                [t.namespace[0] if t.namespace else "", t.name,
                 "VIEW" if t.tableType in ("TEMPORARY", "VIEW") else "TABLE"]
                for t in sess.spark.catalog.listTables()
                if pat.fullmatch(t.name)
            ]
            rows.sort()
            return {"ok": True,
                    "columns": ["TABLE_SCHEM", "TABLE_NAME", "TABLE_TYPE"],
                    "types": ["string", "string", "string"],
                    "rows": rows, "has_more": False}
        if op == "get_columns":
            tbl = req["table"]
            pat = _sql_pattern(req.get("column_pattern", "%"))
            rows = [
                [tbl, f.name, f.dataType.simpleString(), i + 1,
                 bool(f.nullable)]
                for i, f in enumerate(sess.spark.table(tbl).schema.fields)
                if pat.fullmatch(f.name)
            ]
            return {"ok": True,
                    "columns": ["TABLE_NAME", "COLUMN_NAME", "TYPE_NAME",
                                "ORDINAL_POSITION", "NULLABLE"],
                    "types": ["string", "string", "string", "int", "boolean"],
                    "rows": rows, "has_more": False}
        raise ValueError(f"unknown op: {op!r}")

    # -- statement execution ---------------------------------------------------

    def _apply_admission_set(self, sess: _Session, key: str, value) -> None:
        kwargs = {"MAX_REQUESTS": "max_requests",
                  "MAX_QUEUED": "max_queued",
                  "QUEUE_TIMEOUT_MS": "queue_timeout_ms",
                  "MAX_MEM_RESOURCES": "max_mem_resources"}[key]
        v = _parse_mem(value) if key == "MAX_MEM_RESOURCES" else int(value)
        self.admission.configure_pool(sess.pool, **{kwargs: v})

    def _execute(self, sess: _Session, req: dict) -> dict:
        import re
        import time as _time

        sql = (req.get("sql") or "").strip().rstrip(";").strip()
        fetch = int(req.get("fetch", 1024))
        kind, o = self._execute_core(sess, req)
        if kind != "query":
            # session-level statements keep the historical JSON shape:
            # no operation handle is registered
            return {"ok": True, "handle": None, "columns": o.columns,
                    "types": o.types, "rows": o.rows, "has_more": False}
        handle = uuid.uuid4().hex[:12]
        sess.operations[handle] = o
        sess.last_handle = handle
        rows, more = o.fetch(fetch)
        return {"ok": True, "handle": handle, "columns": o.columns,
                "types": o.types, "rows": rows, "has_more": more,
                "row_count": len(o.rows), "elapsed": o.elapsed}

    def _execute_core(self, sess: _Session, req: dict,
                      aop: _AsyncOperation | None = None
                      ) -> tuple[str, _Operation]:
        """Run one statement to a buffered _Operation. Shared by the JSON
        protocol's synchronous execute, the async operation lifecycle, and
        the Thrift HS2 codec. Returns (kind, operation) with kind in
        {"set", "unset", "explain", "query"}."""
        import re
        import time as _time

        sql = (req.get("sql") or "").strip().rstrip(";").strip()
        label = req.get("label", sql[:40])

        # session-level statements that never hit Spark: SET / UNSET
        m = re.match(r"(?is)^SET(\s+(\w+)\s*=\s*(.*))?$", sql)
        if m:
            if m.group(1) is None:
                rows = [[k, v] for k, v in sorted(sess.engine.options.items())]
                return "set", _Operation(["option", "value"],
                                         ["string", "string"], rows)
            k, v = m.group(2).upper(), m.group(3).strip().strip("'\"")
            if k in ("MEM_LIMIT", "MAX_MEM_RESOURCES"):
                _parse_mem(v)  # reject bad specs at SET time, not query time
            sess.engine.set(k, v)
            if k in _ADMISSION_KEYS:
                self._apply_admission_set(sess, k, v)
            return "set", _Operation([], [], [])
        m = re.match(r"(?is)^UNSET\s+(\w+)$", sql)
        if m:
            sess.engine.unset(m.group(1))
            return "unset", _Operation([], [], [])
        if re.match(r"(?is)^EXPLAIN\s", sql):
            plan = sess.engine.explain(sql[len("EXPLAIN"):].strip())
            rows = [[line] for line in plan.splitlines()]
            return "explain", _Operation(["Explain String"], ["string"], rows)

        pool = sess.pool
        # REQUEST_POOL was SET on a (possibly different) connection thread;
        # pool pinning is thread-local, so re-apply before running.
        sess.spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", pool if pool != "default" else None
        )
        # EXEC_TIME_LIMIT_S (query-options.cc exec_time_limit_s; the
        # reference coordinator cancels the query when the wall-clock limit
        # expires): run the statement in its own job group and cancel the
        # group from a watchdog timer. setJobGroup is thread-local, so only
        # this statement's jobs are cancelled. An async operation always
        # runs in its own group so CancelOperation can target it.
        limit = float(sess.engine.options.get("EXEC_TIME_LIMIT_S", "0") or 0)
        sc = sess.spark.sparkContext
        group = aop.group if aop is not None else f"i2s-exec-{uuid.uuid4().hex[:8]}"
        timer = None
        timed_out = threading.Event()
        # /queries debug registry (impala-server.cc webserver callbacks):
        # visible as in-flight from admission to completion, then moved to
        # the bounded completed-query log.
        # parse MEM_LIMIT BEFORE registering in-flight: a bad spec (possible
        # via open_session's config dict, which bypasses the SET-time
        # validation above) must raise without leaking a forever-RUNNING
        # /queries registry entry.
        mem = _parse_mem(sess.engine.options.get("MEM_LIMIT", "0"))
        rec = {"label": label, "sql": sql[:2000], "pool": pool,
               "state": "QUEUED", "start_ts": _time.time(),
               "elapsed_s": None, "rows": None, "error": None}
        with self._lock:  # the webui snapshots these under the same lock
            self._query_seq += 1
            qid = rec["id"] = self._query_seq
            self._inflight[qid] = rec
        # Admit BEFORE arming the watchdog/job group: the reference treats
        # queue timeout (QUEUE_TIMEOUT_MS) and exec time (EXEC_TIME_LIMIT_S)
        # as separate budgets, and an armed timer + thread-local job group
        # must not leak onto later statements when admit() raises.
        # memory-based admission (admission-controller.cc mem_resources):
        # the query's to-admit memory is its MEM_LIMIT option — the
        # reference's mem_limit-based admission configuration (pool cap via
        # SET MAX_MEM_RESOURCES; plan-estimate admission would require
        # planning DDL before admitting it, which this engine executes
        # eagerly, so the option-driven mode is the one implemented).
        try:
            self.admission.admit(pool, label=label, mem=mem)
        except BaseException as e:
            rec.update(state="REJECTED", error=str(e))
            with self._lock:
                self._inflight.pop(qid, None)
                self.query_log.appendleft(rec)
            raise
        rec["state"] = "RUNNING"
        if aop is not None:
            aop.log_line(f"admitted to pool {pool!r}")
        try:
            if aop is not None and aop.cancel_requested.is_set():
                raise OperationCancelled("cancelled while queued")
            if limit > 0 or aop is not None:
                sc.setJobGroup(group, label, interruptOnCancel=True)
            if limit > 0:

                def _cancel():
                    timed_out.set()
                    sc.cancelJobGroup(group)

                timer = threading.Timer(limit, _cancel)
                timer.daemon = True
                timer.start()
            t0 = _time.perf_counter()
            df = sess.engine.sql(sql)
            try:
                collected = df.collect()
            except Exception:
                if aop is not None and aop.cancel_requested.is_set():
                    raise OperationCancelled("cancelled by client") from None
                if timed_out.is_set():
                    raise TimeoutError(
                        f"query exceeded EXEC_TIME_LIMIT_S={limit:g}s "
                        "and was cancelled"
                    ) from None
                raise
            elapsed = _time.perf_counter() - t0
            from .plans import profile_text

            try:
                profile = (
                    f"Query: {sql}\nRows: {len(collected)}\n"
                    f"Elapsed: {elapsed:.3f}s\n" + profile_text(df)
                )
            except Exception:
                profile = f"Query: {sql}\nRows: {len(collected)}\n"
            o = _Operation(
                list(df.columns),
                [f.dataType.simpleString() for f in df.schema.fields],
                [[_json_val(v) for v in tuple(r)] for r in collected],
                profile,
            )
            o.elapsed = round(elapsed, 4)
            rec.update(state="FINISHED", rows=len(collected),
                       elapsed_s=round(elapsed, 4))
        except OperationCancelled:
            rec["state"] = "CANCELED"
            raise
        except BaseException as e:
            rec.update(state="ERROR", error=f"{type(e).__name__}: {e}")
            raise
        finally:
            rec["elapsed_s"] = rec["elapsed_s"] or round(
                _time.time() - rec["start_ts"], 4)
            with self._lock:
                self._inflight.pop(qid, None)
                self.query_log.appendleft(rec)
                self.queries_completed += 1
            self.admission.release(pool, mem=mem)
            if timer is not None:
                timer.cancel()
            if limit > 0 or aop is not None:
                sc.setJobGroup(None, None)
        return "query", o

    # -- async operation lifecycle (GetOperationStatus / Cancel / GetLog) -----

    def _execute_async(self, sess: _Session, req: dict) -> dict:
        sql = (req.get("sql") or "").strip()
        aop = _AsyncOperation(sess.spark.sparkContext,
                              req.get("label", sql[:40]))
        handle = uuid.uuid4().hex[:12]
        sess.operations[handle] = aop
        sess.last_handle = handle
        aop.run(lambda: self._execute_core(sess, req, aop=aop)[1])
        return {"ok": True, "handle": handle, "state": aop.state}

    @staticmethod
    def _resolve(sess: _Session, req: dict):
        o = sess.operations.get(req.get("handle") or sess.last_handle)
        if o is None:
            raise ValueError("unknown operation handle")
        return o

    @staticmethod
    def _finished(o):
        """Unwrap an async operation to its buffered result (or raise if it
        is still running / failed / was cancelled)."""
        if isinstance(o, _AsyncOperation):
            if o.state in ("INITIALIZED", "RUNNING"):
                raise RuntimeError(f"operation still executing ({o.state})")
            if o.state == "CANCELED":
                raise RuntimeError("operation was cancelled")
            if o.state == "ERROR":
                raise RuntimeError(o.error or "operation failed")
            return o.result
        return o


class I2SClient:
    """Minimal blocking client for the JSON-lines protocol (the shell's
    connect mode and tests both use this; the reference analogue is the
    shell's ImpalaClient over HS2)."""

    def __init__(self, host: str, port: int, timeout: float = 120.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._rfile = self._sock.makefile("rb")
        self.session: str | None = None

    def call(self, **req) -> dict:
        self._sock.sendall((json.dumps(req) + "\n").encode("utf-8"))
        line = self._rfile.readline()
        if not line:
            raise ConnectionError("server closed the connection")
        return json.loads(line.decode("utf-8"))

    def open_session(self, sf_dir: str | None = None, config: dict | None = None) -> str:
        resp = self.call(op="open_session", sf_dir=sf_dir, config=config or {})
        if not resp.get("ok"):
            raise RuntimeError(resp.get("error"))
        self.session = resp["session"]
        return self.session

    def execute(self, sql: str, fetch: int = 1024) -> dict:
        resp = self.call(op="execute", session=self.session, sql=sql,
                         fetch=fetch)
        if not resp.get("ok"):
            raise RuntimeError(resp.get("error"))
        return resp

    def fetch_all(self, resp: dict, max_rows: int = 1024) -> list:
        rows = list(resp.get("rows") or [])
        while resp.get("has_more"):
            resp = self.call(op="fetch", session=self.session,
                             handle=resp.get("handle"), max_rows=max_rows)
            if not resp.get("ok"):
                raise RuntimeError(resp.get("error"))
            rows.extend(resp["rows"])
        return rows

    def close(self) -> None:
        try:
            if self.session:
                self.call(op="close_session", session=self.session)
        finally:
            try:
                self._sock.close()
            except OSError:
                pass
