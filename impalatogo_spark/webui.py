"""Debug webserver: /queries, /sessions, /admission, /metrics readouts.

Reference parity: the reference daemon registers HTTP debug pages on its
webserver — queries/sessions/memz/metrics (`be/src/service/impala-server.cc:287`
RegisterWebserverCallbacks; templates `www/queries.tmpl`,
`www/sessions.tmpl`, `www/memz.tmpl`). This module serves the same
readouts over the data the serving core already tracks: the I2SServer
query registry (in-flight + bounded completed log), session registry,
admission pool stats, and process/Spark metrics.

Content negotiation mirrors the reference webserver's `?json` convention:
every endpoint returns HTML tables by default and raw JSON with `?json`
(the reference uses the same toggle for its debug pages). Everything is
driver-side introspection — zero executor-path cost.
"""

from __future__ import annotations

import html
import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .server import I2SServer, _AsyncOperation

_PAGES = ("queries", "sessions", "admission", "metrics", "memz",
          "rpcz", "threadz", "catalog", "logs", "varz", "backends",
          "statestore_topics", "statestore_subscribers")


class _RingHandler(logging.Handler):
    """Bounded in-memory log ring — what /logs tails (the reference's
    /logs page tails the daemon's glog INFO file)."""

    def __init__(self, capacity: int = 500):
        super().__init__(level=logging.INFO)
        import collections

        self.ring = collections.deque(maxlen=capacity)
        self.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname).1s %(name)s] %(message)s",
            datefmt="%H:%M:%S"))

    def emit(self, record):
        try:
            self.ring.append(self.format(record))
        except Exception:
            pass


def install_log_ring(capacity: int = 500) -> _RingHandler:
    """Attach (once) a ring handler to the package logger; idempotent."""
    logger = logging.getLogger("impalatogo_spark")
    for h in logger.handlers:
        if isinstance(h, _RingHandler):
            return h
    h = _RingHandler(capacity)
    logger.addHandler(h)
    logger.setLevel(logging.INFO)
    return h


def _table(rows: list, title: str) -> str:
    if not rows:
        return f"<h2>{html.escape(title)}</h2><p>(none)</p>"
    if not isinstance(rows[0], dict):  # plain lines (e.g. /logs) -> <pre>
        body = html.escape("\n".join(str(r) for r in rows))
        return f"<h2>{html.escape(title)}</h2><pre>{body}</pre>"
    cols = list(rows[0].keys())
    head = "".join(f"<th>{html.escape(str(c))}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(
            f"<td>{html.escape(str(r.get(c, '')))}</td>" for c in cols)
        + "</tr>"
        for r in rows)
    return (f"<h2>{html.escape(title)}</h2>"
            f"<table border=1 cellpadding=4 cellspacing=0>"
            f"<tr>{head}</tr>{body}</table>")


class WebUI:
    """HTTP debug endpoints over a serving core (I2SServer)."""

    def __init__(self, core: I2SServer, host: str = "127.0.0.1",
                 port: int = 0, statestore=None, tls=None):
        self.core = core
        self._host, self._port = host, port
        # optional tls.TlsConfig -> HTTPS-only webserver (reference
        # webserver.cc --webserver_certificate_file)
        self._tls = tls
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self._started = time.time()
        self._log_ring = install_log_ring()
        self._varz_options: list[tuple] | None = None
        self._varz_lock = threading.Lock()
        # when this process also hosts the statestored role, its debug
        # pages (/statestore_topics, /statestore_subscribers) serve here —
        # the reference statestored runs its own webserver
        # (statestore.cc RegisterWebpages); we attach to the shared one
        self.statestore = statestore

    # -- data readouts (shared by JSON and HTML renderings) --

    def queries(self) -> dict:
        core = self.core
        with core._lock:
            inflight = [{k: v for k, v in r.items()
                         if not k.startswith("_")}
                        for r in core._inflight.values()]
            completed = [{k: v for k, v in r.items()
                          if not k.startswith("_")}
                         for r in core.query_log]
        for r in inflight:
            r["elapsed_s"] = round(time.time() - r["start_ts"], 3)
        return {"in_flight": inflight, "completed": completed,
                "num_in_flight": len(inflight),
                "num_completed": core.queries_completed}

    def query_detail(self, qid: int) -> dict | None:
        """Per-query detail page (www/query_detail_tabs.tmpl /
        query_profile.tmpl equivalents): statement, state, runtime profile
        text, and the executed-metrics operator tree — for completed AND
        in-flight queries (an in-flight one shows rows produced so far)."""
        core = self.core
        with core._lock:
            rec = core._inflight.get(qid)
            if rec is None:
                rec = next((r for r in core.query_log
                            if r.get("id") == qid), None)
            rec = dict(rec) if rec is not None else None
        if rec is None:
            return None
        op = rec.pop("_op", None)
        out = {k: v for k, v in rec.items() if not k.startswith("_")}
        if rec.get("state") == "RUNNING":
            out["elapsed_s"] = round(time.time() - rec["start_ts"], 3)
        if op is None and rec.get("state") == "RUNNING":
            # Planning/admission window: _execute_core registers the record
            # RUNNING before the streaming operation exists, so a poll here
            # must still see the progress keys (zero rows so far).
            out["rows_produced"] = 0
            out["rows_fetched"] = 0
            out["profile"] = (f"Query: {rec.get('sql', '')[:200]}\n"
                              "State: RUNNING\nRows produced so far: 0\n")
            out["operators"] = []
        if op is not None:
            out["rows_produced"] = op.push_count
            out["rows_fetched"] = op.pos
            out["profile"] = op.profile
            out["operators"] = [
                {"operator": name, "depth": depth,
                 "rows": vals.get("number of output rows"),
                 "peak_memory": vals.get("peak memory"),
                 "duration_ms": vals.get("duration"),
                 "detail": ", ".join(
                     f"{k}={v:,}" for k, v in sorted(vals.items())
                     if isinstance(v, int) and v
                     and k not in ("number of output rows", "peak memory",
                                   "duration"))[:200]}
                for depth, name, vals in (op.metrics_tree or [])]
        return out

    def query_plan(self, qid: int) -> dict | None:
        """Executed plan as a JSON DAG (the reference /query_plan page,
        www/query_plan.tmpl, feeds dagre-d3 a node/edge list built from
        TExecSummary; query_detail_tabs.tmpl links it). Nodes come from the
        same executed-metrics tree the profile and GetExecSummary render:
        id = pre-order index, parent = nearest shallower predecessor (the
        pre-order inverse), rows + the non-zero integer metrics per node."""
        core = self.core
        with core._lock:
            rec = core._inflight.get(qid)
            if rec is None:
                rec = next((r for r in core.query_log
                            if r.get("id") == qid), None)
            rec = dict(rec) if rec is not None else None
        if rec is None:
            return None
        op = rec.get("_op")
        tree = getattr(op, "metrics_tree", None) or []
        nodes = []
        stack: list[tuple[int, int]] = []  # (depth, node id) ancestors
        for i, (d, name, vals) in enumerate(tree):
            while stack and stack[-1][0] >= d:
                stack.pop()
            parent = stack[-1][1] if stack else None
            nodes.append({
                "id": i, "label": name, "parent": parent, "depth": d,
                "rows": int(vals.get("number of output rows", 0) or 0),
                "metrics": {k: v for k, v in sorted(vals.items())
                            if isinstance(v, int) and v},
            })
            stack.append((d, i))
        out = {"query_id": qid, "state": rec.get("state"),
               "statement": rec.get("sql"),
               "num_nodes": len(nodes), "nodes": nodes}
        if not nodes and rec.get("state") == "RUNNING":
            # r06 ADVICE: metrics_tree is snapshotted at EOS, so an
            # in-flight query legitimately has no captured plan yet —
            # say so instead of looking like a plan-less statement
            out["note"] = "plan available after completion"
        return out

    @staticmethod
    def _plan_svg(dag: dict) -> str:
        """Tiny dependency-free SVG rendering of the plan DAG: one box per
        node (column = depth, row = pre-order index), an edge to its
        parent — the graphical plan without shipping dagre-d3."""
        nodes = dag["nodes"]
        if not nodes:
            return "<p>(no executed plan captured)</p>"
        bw, bh, xgap, ygap = 260, 26, 40, 8
        pos = {n["id"]: (n["depth"] * (bw + xgap) + 4,
                         n["id"] * (bh + ygap) + 4) for n in nodes}
        width = max(x for x, _ in pos.values()) + bw + 8
        height = max(y for _, y in pos.values()) + bh + 8
        parts = [f'<svg width="{width}" height="{height}" '
                 f'xmlns="http://www.w3.org/2000/svg" '
                 f'font-family="monospace" font-size="12">']
        for n in nodes:
            if n["parent"] is None:
                continue
            px, py = pos[n["parent"]]
            cx, cy = pos[n["id"]]
            parts.append(
                f'<path d="M {px + 20} {py + bh} V {cy + bh // 2} '
                f'H {cx}" stroke="#888" fill="none"/>')
        for n in nodes:
            x, y = pos[n["id"]]
            label = html.escape(f'{n["id"]:02d}:{n["label"]}')[:34]
            rows = f'{n["rows"]:,} rows' if n["rows"] else ""
            parts.append(
                f'<g><rect x="{x}" y="{y}" width="{bw}" height="{bh}" '
                f'rx="4" fill="#eef" stroke="#558"/>'
                f'<text x="{x + 6}" y="{y + 17}">{label}</text>'
                f'<text x="{x + bw - 6}" y="{y + 17}" text-anchor="end" '
                f'fill="#666">{rows}</text></g>')
        parts.append("</svg>")
        return "".join(parts)

    def sessions(self) -> dict:
        import time as _time

        core = self.core
        now = _time.monotonic()
        with core._lock:
            rows = [{"session": sid, "pool": s.pool,
                     "open_operations": len(s.operations),
                     "idle_s": round(now - s.last_used, 1),
                     "async_running": sum(
                         1 for o in s.operations.values()
                         if isinstance(o, _AsyncOperation)
                         and not o.done.is_set())}
                    for sid, s in core._sessions.items()]
        return {"sessions": rows, "num_sessions": len(rows)}

    def admission(self) -> dict:
        return {"pools": self.core.admission.stats()}

    def metrics(self) -> dict:
        spark = self.core._spark
        sc = spark.sparkContext
        q = self.queries()
        return {
            "server": "i2s-server",
            "uptime_s": round(time.time() - self._started, 1),
            "spark_version": spark.version,
            "default_parallelism": sc.defaultParallelism,
            "num_sessions": len(self.core._sessions),
            "num_queries_in_flight": q["num_in_flight"],
            "num_queries_completed": q["num_completed"],
            "admission_pools": self.core.admission.stats(),
            # statestore membership topic (empty unless cluster-attached)
            "cluster_membership": dict(self.core.cluster_membership),
            "catalog_version": self.core._catalog_version,
        }

    def memz(self) -> dict:
        """Memory readout (www/memz.tmpl): JVM heap via the live
        SparkContext, python RSS, and the storage-memory cache state."""
        sc = self.core._spark.sparkContext
        rt = sc._jvm.java.lang.Runtime.getRuntime()  # noqa: SLF001
        heap_total, heap_free = rt.totalMemory(), rt.freeMemory()
        rss_kb = None
        try:
            with open("/proc/self/status") as fh:
                for line in fh:
                    if line.startswith("VmRSS:"):
                        rss_kb = int(line.split()[1])
                        break
        except OSError:
            pass
        jsc = sc._jsc.sc()  # noqa: SLF001
        rdds = jsc.getPersistentRDDs()
        return {
            "jvm_heap_total_mb": round(heap_total / 1048576, 1),
            "jvm_heap_used_mb": round((heap_total - heap_free) / 1048576, 1),
            "jvm_heap_max_mb": round(rt.maxMemory() / 1048576, 1),
            "python_rss_mb": round(rss_kb / 1024, 1) if rss_kb else None,
            "persistent_rdds": rdds.size(),
        }

    def rpcz(self) -> dict:
        """Per-method RPC call counters across all protocol doors
        (impala's /rpcz debug page)."""
        core = self.core
        with core._lock:
            counts = dict(sorted(core.rpc_counts.items()))
        return {"rpcs": [{"method": k, "calls": v}
                         for k, v in counts.items()],
                "total_calls": sum(counts.values())}

    def threadz(self) -> dict:
        """Live server threads (impala's /threadz thread-group listing):
        connection handlers, statement drainers, watchdogs, reapers."""
        rows = [{"name": t.name, "ident": t.ident, "daemon": t.daemon,
                 "alive": t.is_alive()}
                for t in sorted(threading.enumerate(),
                                key=lambda t: t.name)]
        groups: dict[str, int] = {}
        for r in rows:
            key = r["name"].rstrip("0123456789-_abcdef")
            groups[key] = groups.get(key, 0) + 1
        return {"threads": rows, "num_threads": len(rows),
                "groups": [{"group": k, "count": v}
                           for k, v in sorted(groups.items())]}

    def catalog(self) -> dict:
        """Catalog listing (catalogd's /catalog page, www/catalog.tmpl):
        databases and persistent tables from the shared catalog, plus each
        live session's temp-view count (session-local objects are not in
        the shared catalog — the HS2 per-session contract)."""
        spark = self.core._spark
        dbs = [d.name for d in spark.catalog.listDatabases()]
        tables = [{"database": t.namespace[0] if t.namespace else "",
                   "table": t.name,
                   "type": ("VIEW" if t.tableType in ("TEMPORARY", "VIEW")
                            else "TABLE")}
                  for t in spark.catalog.listTables()]
        with self.core._lock:
            sess = [{"session": sid,
                     "temp_views": sum(
                         1 for t in s.spark.catalog.listTables()
                         if t.tableType == "TEMPORARY")}
                    for sid, s in self.core._sessions.items()]
        return {"databases": [{"database": d} for d in dbs],
                "tables": tables, "session_views": sess,
                "num_tables": len(tables)}

    def catalog_object(self, name: str) -> dict | None:
        """Single catalog object drill-down (catalogd's /catalog_object
        page, www/catalog_object.tmpl + ?object_type=TABLE&object_name=):
        full schema with partition/bucket flags, table metadata (provider,
        location, owner), computed stats when present, and the partition
        list for partitioned tables — all from the shared Spark catalog,
        the layer standing in for the reference's Thrift catalog objects
        (JniCatalog)."""
        spark = self.core._spark
        try:
            tbl = spark.catalog.getTable(name)
        except Exception:
            return None
        cols = [{"column": c.name, "type": c.dataType,
                 "nullable": c.nullable, "partition_key": c.isPartition,
                 "bucket_key": c.isBucket}
                for c in spark.catalog.listColumns(name)]
        detail: dict[str, str] = {}
        try:
            for r in spark.sql(
                    f"DESCRIBE TABLE EXTENDED {name}").collect():
                key = (r["col_name"] or "").strip()
                if key and key not in ("", "# Detailed Table Information",
                                       "# col_name"):
                    val = (r["data_type"] or "").strip()
                    if key in ("Catalog", "Database", "Table", "Type",
                               "Provider", "Location", "Owner",
                               "Created Time", "Statistics", "View Text"):
                        detail[key] = val
        except Exception:
            pass  # temp views of other sessions / concurrent drop
        partitions: list[dict] = []
        if any(c["partition_key"] for c in cols):
            try:
                partitions = [{"partition": r[0]} for r in spark.sql(
                    f"SHOW PARTITIONS {name}").collect()]
            except Exception:
                pass  # datasource tables without partition metadata
        return {"name": name,
                "object_type": ("VIEW" if tbl.tableType in
                                ("TEMPORARY", "VIEW") else "TABLE"),
                "database": (tbl.namespace[0] if tbl.namespace else ""),
                "is_temporary": tbl.isTemporary,
                "schema": cols, "num_columns": len(cols),
                "detail": detail, "partitions": partitions,
                "num_partitions": len(partitions)}

    def logs(self) -> dict:
        """Tail of the daemon's INFO log (the reference /logs page tails
        the glog stream): session/query lifecycle, admission decisions."""
        lines = list(self._log_ring.ring)
        return {"lines": lines, "num_lines": len(lines)}

    def varz(self) -> dict:
        """Process configuration dump (the reference /varz page prints the
        daemon's gflags, www/common-header: impala-server.cc flag registry):
        serving-core knobs, the engine's PROCESS-DEFAULT query-option table
        with docs, and the Spark session confs this engine pins. The option
        table reports process defaults, NOT per-session SET overrides
        (sessions hold their own engines; this matches the reference /varz,
        which dumps daemon gflags, not session state). Built once on first
        GET and cached — constructing an Engine runs session-conf setup and
        a current_user() job, which must not happen per request."""
        from .engine import Engine

        core = self.core
        flags = {
            "host": core._host, "port": core._port,
            "sf_dir": core._sf_dir,
            "fetch_window_rows": core.fetch_window_rows,
            "fetch_idle_timeout_s": core.fetch_idle_timeout_s,
            "idle_session_timeout_s": core.idle_session_timeout_s,
        }
        with self._varz_lock:  # r06 ADVICE: one build under concurrent GETs
            if self._varz_options is None:
                self._varz_options = list(
                    Engine(core._spark).default_configuration())
        opts = [
            {"option": k, "default": v, "doc": d}
            for k, v, d in self._varz_options
        ]
        pinned = (
            "spark.sql.legacy.parquet.nanosAsLong",
            "spark.sql.session.timeZone",
            "spark.sql.ansi.enabled",
            "spark.sql.python.filterPushdown.enabled",
            "spark.sql.sources.partitionOverwriteMode",
            "spark.sql.adaptive.enabled",
            "spark.sql.shuffle.partitions",
        )
        confs = [
            {"conf": k, "value": core._spark.conf.get(k, "<unset>")}
            for k in pinned
        ]
        return {"flags": flags, "query_options": opts,
                "pinned_spark_confs": confs}

    def backends(self) -> dict:
        """Cluster membership as seen by THIS daemon (the reference
        /backends page, www/backends.tmpl: one row per live impalad from
        the statestore membership topic). Rows appear when the daemon is
        attached to a statestore (attach_statestore) and disappear when
        the statestore sheds a failed member (transient-topic cleanup)."""
        core = self.core
        with core._lock:
            mem = dict(core.cluster_membership)
        rows = [{"backend_id": k, "address": v,
                 "is_local": k == getattr(core, "statestore_subscriber_id",
                                          None)}
                for k, v in sorted(mem.items())]
        return {"backends": rows, "num_backends": len(rows)}

    def statestore_topics(self) -> dict:
        """Topic table of the co-hosted statestored role (reference
        www/statestore_topics.tmpl): entry/tombstone counts, version range,
        oldest subscriber version, payload sizes."""
        if self.statestore is None:
            return {"error": "no statestore co-hosted on this daemon",
                    "topics": []}
        return {"topics": self.statestore.topics_summary()}

    def statestore_subscribers(self) -> dict:
        """Subscriber table of the co-hosted statestored role (reference
        www/statestore_subscribers.tmpl), plus the recently-failed list
        (members shed by the missed-heartbeat failure detector)."""
        if self.statestore is None:
            return {"error": "no statestore co-hosted on this daemon",
                    "subscribers": [], "failed_subscribers": []}
        return {"subscribers": self.statestore.subscribers_summary(),
                "failed_subscribers": list(
                    self.statestore.failed_subscribers)}

    # -- http plumbing --

    def start(self) -> tuple[str, int]:
        ui = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet: no stderr per request
                pass

            def do_GET(self):
                parsed = urlparse(self.path)
                page = parsed.path.strip("/") or "index"
                as_json = "json" in parse_qs(parsed.query) or \
                    "json" in parsed.query
                if page == "index":
                    links = "".join(f'<li><a href="/{p}">/{p}</a> '
                                    f'(<a href="/{p}?json">json</a>)</li>'
                                    for p in _PAGES)
                    self._send(200, f"<h1>i2s-server debug</h1><ul>{links}"
                               "</ul>", "text/html")
                    return
                if page == "query":
                    try:
                        qid = int(parse_qs(parsed.query).get("id", [""])[0])
                    except (ValueError, IndexError):
                        self._send(400, json.dumps(
                            {"error": "missing or bad id"}),
                            "application/json")
                        return
                    data = ui.query_detail(qid)
                    if data is None:
                        self._send(404, json.dumps(
                            {"error": f"unknown query id {qid}"}),
                            "application/json")
                        return
                    if as_json:
                        self._send(200, json.dumps(data, default=str),
                                   "application/json")
                        return
                    parts = [f"<h1>query {qid}</h1>"]
                    parts.append(
                        f'<p><a href="/query_plan?id={qid}">plan DAG</a> '
                        f'(<a href="/query_plan?id={qid}&json">json</a>)'
                        "</p>")
                    parts.append("<pre>"
                                 + html.escape(data.get("sql") or "")
                                 + "</pre>")
                    for key in ("state", "pool", "elapsed_s", "rows",
                                "rows_produced", "rows_fetched", "error"):
                        if data.get(key) is not None:
                            parts.append(
                                f"<p>{key}: "
                                f"{html.escape(str(data[key]))}</p>")
                    ops = data.get("operators") or []
                    if ops:
                        rows = [{**o, "operator":
                                 " " * (2 * o["depth"]) + o["operator"]}
                                for o in ops]
                        parts.append(_table(rows, "operators"))
                    if data.get("profile"):
                        parts.append("<h2>profile</h2><pre>"
                                     + html.escape(data["profile"])
                                     + "</pre>")
                    self._send(200, "".join(parts), "text/html")
                    return
                if page == "query_plan":
                    try:
                        qid = int(parse_qs(parsed.query).get("id", [""])[0])
                    except (ValueError, IndexError):
                        self._send(400, json.dumps(
                            {"error": "missing or bad id"}),
                            "application/json")
                        return
                    dag = ui.query_plan(qid)
                    if dag is None:
                        self._send(404, json.dumps(
                            {"error": f"unknown query id {qid}"}),
                            "application/json")
                        return
                    if as_json:
                        self._send(200, json.dumps(dag, default=str),
                                   "application/json")
                        return
                    self._send(
                        200,
                        f"<h1>query {qid} plan</h1><pre>"
                        + html.escape(dag.get("statement") or "")
                        + "</pre>" + ui._plan_svg(dag),
                        "text/html")
                    return
                if page == "catalog_object":
                    qs = parse_qs(parsed.query)
                    name = (qs.get("object_name") or qs.get("name")
                            or [""])[0]
                    if not name:
                        self._send(400, json.dumps(
                            {"error": "missing object_name"}),
                            "application/json")
                        return
                    data = ui.catalog_object(name)
                    if data is None:
                        self._send(404, json.dumps(
                            {"error": f"unknown catalog object {name}"}),
                            "application/json")
                        return
                    if as_json:
                        self._send(200, json.dumps(data, default=str),
                                   "application/json")
                        return
                    parts = [f"<h1>{html.escape(name)} "
                             f"({html.escape(data['object_type'])})</h1>"]
                    for key in ("database", "is_temporary"):
                        parts.append(f"<p>{key}: "
                                     f"{html.escape(str(data[key]))}</p>")
                    parts.append(_table(data["schema"], "schema"))
                    if data["detail"]:
                        parts.append(_table(
                            [{"property": k, "value": v}
                             for k, v in data["detail"].items()], "detail"))
                    if data["partitions"]:
                        parts.append(_table(data["partitions"],
                                            "partitions"))
                    self._send(200, "".join(parts), "text/html")
                    return
                if page not in _PAGES:
                    self._send(404, json.dumps({"error": "not found"}),
                               "application/json")
                    return
                data = getattr(ui, page)()
                if as_json:
                    self._send(200, json.dumps(data, default=str),
                               "application/json")
                    return
                parts = [f"<h1>/{page}</h1>"]
                for key, val in data.items():
                    if isinstance(val, list):
                        parts.append(_table(val, key))
                    elif isinstance(val, dict):
                        parts.append(_table(
                            [{"name": k, **v} if isinstance(v, dict)
                             else {"name": k, "value": v}
                             for k, v in val.items()], key))
                    else:
                        parts.append(f"<p>{html.escape(str(key))}: "
                                     f"{html.escape(str(val))}</p>")
                self._send(200, "".join(parts), "text/html")

            def _send(self, code: int, body: str, ctype: str):
                data = body.encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", f"{ctype}; charset=utf-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        self._httpd = ThreadingHTTPServer((self._host, self._port), Handler)
        if self._tls is not None:
            # wrap the LISTENER: accept() then hands each connection an
            # SSLSocket whose handshake runs lazily on its handler thread
            self._httpd.socket = self._tls.server_context().wrap_socket(
                self._httpd.socket, server_side=True,
                do_handshake_on_connect=False)
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        name="i2s-webui", daemon=True)
        self._thread.start()
        return self._httpd.server_address[:2]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
