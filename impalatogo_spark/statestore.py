"""Statestore + catalog-update propagation: the multi-daemon control plane.

Reference parity: the reference cluster has three daemon roles — impalads,
one statestored, one catalogd. The statestore (`be/src/statestore/
statestore.h:50-79`, `statestore.cc`) distributes versioned <key, value>
TOPICS to registered subscribers via periodic UPDATE messages (per-topic
deltas covering [from_version, to_version); the subscriber's RESPONSE
carries its own topic updates — that is how catalog changes and membership
flow back), plus separate HEARTBEAT messages feeding a missed-heartbeat
failure detector (`failure-detector.h` MissedHeartbeatFailureDetector):
a subscriber that misses N consecutive heartbeats is declared failed,
unregistered, and its TRANSIENT topic entries are deleted (how cluster
membership self-heals). Catalogd (`catalog-server`) publishes versioned
catalog objects on the "catalog-update" topic; every impalad applies them
to its local catalog cache.

Spark-native mapping: one SparkContext replaces the reference's executor
fleet, so the data plane needs no statestore — but the control-plane state
the reference propagates (daemon membership; engine-level catalog objects
such as external data sources, functions, and authorization grants, which
live in per-engine registries rather than Spark's shared catalog) is
faithfully reproduced here: a `Statestore` with versioned topics, delta
updates, transient entries, re-registration supersession and the
missed-heartbeat failure detector; a `StatestoreSubscriber` mirror; and
`attach_statestore()` glue on the serving core (server.py) that publishes
membership (transient) and catalog DDL, applies received catalog updates
to the core's local catalog log, and replays that log into each NEW
session's engine — the reference's "impalad applies catalog updates to
its local cache" contract. Transport is in-process callable endpoints
(the update/heartbeat RPC surface mirrors StatestoreService.thrift
TTopicDelta: is_delta / from_version / to_version / deletions /
min_subscriber_topic_version); everything is driver-side control plane —
zero executor-path cost.
"""

from __future__ import annotations

import threading
import uuid


class TopicEntry:
    """A single <key, value> entry (statestore.h:127 TopicEntry). value is
    opaque to the statestore; None is the NULL/deleted marker."""

    __slots__ = ("value", "version")

    def __init__(self, value, version: int):
        self.value = value
        self.version = version


class Topic:
    """A versioned key/value map with an update log for delta computation
    (statestore.h:174-231: entries_, last_version_, topic_update_log_)."""

    def __init__(self, topic_id: str):
        self.topic_id = topic_id
        self.entries: dict[str, TopicEntry] = {}
        self.last_version = 0
        # version -> key, the log used to build [from, to) deltas
        self.update_log: dict[int, str] = {}

    def put(self, key: str, value) -> int:
        old = self.entries.get(key)
        if old is not None:
            self.update_log.pop(old.version, None)
        self.last_version += 1
        self.entries[key] = TopicEntry(value, self.last_version)
        self.update_log[self.last_version] = key
        return self.last_version

    def delete_if_version_matches(self, key: str, version: int) -> None:
        """statestore.h:202 DeleteIfVersionsMatch: transient-entry cleanup
        must not clobber a newer write by another subscriber."""
        e = self.entries.get(key)
        if e is not None and e.version == version:
            self.put(key, None)  # deletion = a new versioned NULL entry

    def delta_since(self, from_version: int) -> dict:
        """TTopicDelta for (from_version, last_version]: entries newer than
        the subscriber's last processed version. from_version=0 returns the
        whole topic with is_delta=False (the initial full update)."""
        items, deletions = [], []
        for v in sorted(self.update_log):
            if v <= from_version:
                continue
            key = self.update_log[v]
            e = self.entries[key]
            if e.value is None:
                deletions.append(key)
            else:
                items.append({"key": key, "value": e.value, "version": v})
        return {"topic_name": self.topic_id,
                "topic_entries": items,
                "topic_deletions": deletions,
                "is_delta": from_version > 0,
                "from_version": from_version,
                "to_version": self.last_version}


class MissedHeartbeatFailureDetector:
    """failure-detector.h: a peer that misses `max_missed` consecutive
    heartbeats is FAILED; one successful beat resets the count."""

    def __init__(self, max_missed: int):
        self.max_missed = max_missed
        self._missed: dict[str, int] = {}

    def beat_ok(self, peer: str) -> None:
        self._missed[peer] = 0

    def beat_missed(self, peer: str) -> bool:
        """Record a miss; True when the peer just crossed the threshold."""
        n = self._missed.get(peer, 0) + 1
        self._missed[peer] = n
        return n >= self.max_missed

    def forget(self, peer: str) -> None:
        self._missed.pop(peer, None)


class Statestore:
    """The statestored role (statestore.h:79). Subscribers register with
    topic subscriptions; `run_update_cycle()` / `run_heartbeat_cycle()`
    advance one round each (called by the background loop when `start()`ed,
    or directly by tests for determinism — the reference's update and
    heartbeat threads, statestore.cc:628, collapsed to explicit rounds)."""

    def __init__(self, max_missed_heartbeats: int = 3):
        self._lock = threading.RLock()
        self.topics: dict[str, Topic] = {}
        self.subscribers: dict[str, dict] = {}  # id -> registration record
        self.failure_detector = MissedHeartbeatFailureDetector(
            max_missed_heartbeats)
        self.failed_subscribers: list[str] = []
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()

    # -- registration (statestore.h:102 RegisterSubscriber) -----------------

    def register_subscriber(self, subscriber_id: str, endpoint,
                            topic_registrations: list[dict]) -> str:
        """topic_registrations: [{"topic_name": str, "is_transient": bool}].
        Re-registration with the same id supersedes the old registration
        (statestore.h:100): updates in flight for the old registration_id
        are ignored by the subscriber side."""
        registration_id = uuid.uuid4().hex
        with self._lock:
            self.subscribers[subscriber_id] = {
                "registration_id": registration_id,
                "endpoint": endpoint,
                "topics": {r["topic_name"]: {
                    "is_transient": bool(r.get("is_transient")),
                    "last_version": 0} for r in topic_registrations},
                # (topic, key) -> version of transient writes, for cleanup
                "transient_entries": {},
            }
            for r in topic_registrations:
                self.topics.setdefault(r["topic_name"],
                                       Topic(r["topic_name"]))
            self.failure_detector.forget(subscriber_id)
        return registration_id

    def unregister_subscriber(self, subscriber_id: str) -> None:
        with self._lock:
            sub = self.subscribers.pop(subscriber_id, None)
            if sub is None:
                return
            # delete this subscriber's transient entries (version-matched,
            # statestore.cc failure path) so peers observe the departure
            for (topic_id, key), version in sub["transient_entries"].items():
                t = self.topics.get(topic_id)
                if t is not None:
                    t.delete_if_version_matches(key, version)
            self.failure_detector.forget(subscriber_id)

    # -- update cycle (statestore.cc UpdateSubscriber) -----------------------

    def _min_subscriber_version(self, topic_id: str) -> int:
        with self._lock:
            versions = [s["topics"][topic_id]["last_version"]
                        for s in self.subscribers.values()
                        if topic_id in s["topics"]]
        return min(versions) if versions else 0

    def run_update_cycle(self) -> None:
        """One update round: send each subscriber its per-topic deltas,
        apply the updates its response carries (the reference's
        TUpdateStateResponse.topic_updates — this is how a catalogd-role
        subscriber publishes), advance its processed versions on accept."""
        with self._lock:
            subs = list(self.subscribers.items())
        for sid, sub in subs:
            deltas = {}
            with self._lock:
                if self.subscribers.get(sid) is not sub:
                    continue  # superseded mid-round
                for topic_id, state in sub["topics"].items():
                    t = self.topics[topic_id]
                    deltas[topic_id] = dict(
                        t.delta_since(state["last_version"]),
                        min_subscriber_topic_version=
                        self._min_subscriber_version(topic_id))
            try:
                resp = sub["endpoint"].update_state(
                    sub["registration_id"], deltas)
            except Exception:
                continue  # a failed update is NOT a failure signal
                # (statestore.cc:431 — only heartbeats drive the detector)
            if not resp or resp.get("skipped"):
                continue  # subscriber skipped: do not advance its versions
            with self._lock:
                if self.subscribers.get(sid) is not sub:
                    continue
                for topic_id, delta in deltas.items():
                    sub["topics"][topic_id]["last_version"] = \
                        delta["to_version"]
                for upd in resp.get("topic_updates") or []:
                    topic_id = upd["topic_name"]
                    t = self.topics.setdefault(topic_id, Topic(topic_id))
                    transient = sub["topics"].get(
                        topic_id, {}).get("is_transient", False)
                    for item in upd.get("topic_entries") or []:
                        v = t.put(item["key"], item["value"])
                        if transient:
                            sub["transient_entries"][
                                (topic_id, item["key"])] = v
                    for key in upd.get("topic_deletions") or []:
                        t.put(key, None)

    # -- heartbeat cycle (statestore.cc:383 + failure detector) -------------

    def run_heartbeat_cycle(self) -> None:
        with self._lock:
            subs = list(self.subscribers.items())
        for sid, sub in subs:
            ok = False
            try:
                ok = bool(sub["endpoint"].heartbeat(sub["registration_id"]))
            except Exception:
                ok = False
            if ok:
                self.failure_detector.beat_ok(sid)
            elif self.failure_detector.beat_missed(sid):
                self.unregister_subscriber(sid)
                with self._lock:
                    self.failed_subscribers.append(sid)

    # -- background loop (statestore.cc:628 update/heartbeat threads) -------

    def start(self, update_frequency_s: float = 0.05,
              heartbeat_frequency_s: float = 0.05) -> None:
        def _loop():
            while not self._stop.wait(timeout=update_frequency_s):
                try:
                    self.run_update_cycle()
                    self.run_heartbeat_cycle()
                except Exception:
                    pass

        self._stop.clear()
        self._thread = threading.Thread(target=_loop, name="i2s-statestore",
                                        daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    # -- web introspection (statestore.cc RegisterWebpages:
    #    TopicsHandler / SubscribersHandler feed www/statestore_topics.tmpl
    #    and www/statestore_subscribers.tmpl) -------------------------------

    def topics_summary(self) -> list[dict]:
        """One row per topic: live entry / tombstone counts, version range,
        the oldest version any subscriber still needs, and payload sizes —
        the columns of the reference /statestore_topics table."""
        with self._lock:
            rows = []
            for tid in sorted(self.topics):
                t = self.topics[tid]
                live = [e for e in t.entries.values() if e.value is not None]
                tombs = len(t.entries) - len(live)
                versions = sorted(t.update_log)
                rows.append({
                    "topic_id": tid,
                    "num_entries": len(live),
                    "num_tombstones": tombs,
                    "oldest_version": versions[0] if versions else 0,
                    "last_version": t.last_version,
                    "oldest_subscriber_version":
                        self._min_subscriber_version(tid),
                    "key_size_bytes": sum(len(str(k)) for k in t.entries),
                    "value_size_bytes": sum(
                        len(str(e.value)) for e in live),
                })
            return rows

    def subscribers_summary(self) -> list[dict]:
        """One row per registered subscriber: registration id, endpoint,
        subscribed topics (transient flagged), transient-entry count, and
        consecutive missed heartbeats — the reference
        /statestore_subscribers table, plus the recently-failed list."""
        with self._lock:
            rows = []
            for sid in sorted(self.subscribers):
                sub = self.subscribers[sid]
                topics = ", ".join(
                    f"{tid}{' (transient)' if st['is_transient'] else ''}"
                    for tid, st in sorted(sub["topics"].items()))
                rows.append({
                    "subscriber_id": sid,
                    "registration_id": sub["registration_id"][:12],
                    "endpoint": (
                        f"{sub['endpoint']._host}:{sub['endpoint']._port}"
                        if hasattr(sub["endpoint"], "_host") else "inproc"),
                    "topics": topics,
                    "num_transient_entries": len(sub["transient_entries"]),
                    "missed_heartbeats":
                        self.failure_detector._missed.get(sid, 0),
                })
            return rows


class StatestoreSubscriber:
    """The subscriber-side mirror (statestore-subscriber.h): per-topic
    callbacks, processed-version tracking, a pending-updates buffer that
    rides out on the next update response, and rejection of updates for a
    superseded registration."""

    def __init__(self, subscriber_id: str):
        self.subscriber_id = subscriber_id
        self._lock = threading.Lock()
        self.registration_id: str | None = None
        self._callbacks: dict[str, list] = {}
        self._pending: list[dict] = []
        self.heartbeat_ok = True  # tests flip this to simulate a dead peer
        self.updates_received = 0

    def subscribe(self, topic_name: str, callback) -> None:
        """callback(delta_dict) is invoked for every update of the topic
        (including empty deltas, like the reference's per-update callback)."""
        self._callbacks.setdefault(topic_name, []).append(callback)

    def publish(self, topic_name: str, entries: list[dict] | None = None,
                deletions: list[str] | None = None) -> None:
        """Buffer updates; they leave on the next update_state response
        (the reference subscriber's outbound topic_updates path)."""
        with self._lock:
            self._pending.append({"topic_name": topic_name,
                                  "topic_entries": entries or [],
                                  "topic_deletions": deletions or []})

    # -- endpoint surface the Statestore calls -------------------------------

    def update_state(self, registration_id: str, deltas: dict) -> dict:
        if registration_id != self.registration_id:
            # update meant for a superseded registration (statestore.h:100)
            return {"skipped": True}
        self.updates_received += 1
        for topic_name, delta in deltas.items():
            for cb in self._callbacks.get(topic_name, []):
                cb(delta)
        with self._lock:
            out, self._pending = self._pending, []
        return {"skipped": False, "topic_updates": out}

    def heartbeat(self, registration_id: str) -> bool:
        return self.heartbeat_ok and registration_id == self.registration_id

    def register(self, statestore: Statestore,
                 topic_registrations: list[dict]) -> None:
        self.registration_id = statestore.register_subscriber(
            self.subscriber_id, self, topic_registrations)


# ---------------------------------------------------------------------------
# TCP transport: the reference statestored CALLS BACK into each
# subscriber's StatestoreSubscriber thrift service (statestore-subscriber.h
# registers a server port; statestore.cc opens update/heartbeat client
# connections to it). Here the subscriber exposes its endpoint surface
# over newline-delimited JSON on a listening socket, and the statestore
# side holds a connecting proxy — registration passes "host:port" instead
# of an in-process object.
# ---------------------------------------------------------------------------


class SubscriberTcpServer:
    """Serve a StatestoreSubscriber's update_state/heartbeat endpoint over
    TCP (JSON-lines, one request/response per line)."""

    def __init__(self, subscriber: StatestoreSubscriber,
                 host: str = "127.0.0.1", port: int = 0):
        import json
        import socketserver

        sub = subscriber

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                for raw in self.rfile:
                    line = raw.decode("utf-8", errors="replace").strip()
                    if not line:
                        continue
                    try:
                        req = json.loads(line)
                        if req.get("op") == "update_state":
                            resp = sub.update_state(
                                req.get("registration_id"),
                                req.get("deltas") or {})
                        elif req.get("op") == "heartbeat":
                            resp = {"ok": sub.heartbeat(
                                req.get("registration_id"))}
                        else:
                            resp = {"error": f"unknown op {req.get('op')!r}"}
                    except Exception as e:
                        resp = {"error": f"{type(e).__name__}: {e}"}
                    self.wfile.write(
                        (json.dumps(resp) + "\n").encode("utf-8"))
                    self.wfile.flush()

        class TCP(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._tcp = TCP((host, port), Handler)
        self.address = "%s:%d" % self._tcp.server_address[:2]
        self._thread = threading.Thread(
            target=self._tcp.serve_forever,
            name=f"statestore-sub-{subscriber.subscriber_id}", daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._tcp.shutdown()
        self._tcp.server_close()


class SubscriberTcpProxy:
    """Statestore-side endpoint proxy: connects to a subscriber's TCP
    server and forwards update_state/heartbeat over the wire. A transport
    error surfaces as a missed heartbeat / skipped update, exactly how the
    reference treats an unreachable subscriber."""

    def __init__(self, address: str, timeout: float = 10.0):
        self._host, port = address.rsplit(":", 1)
        self._port = int(port)
        self._timeout = timeout
        self._lock = threading.Lock()
        self._sock = None
        self._rfile = None

    def _call(self, req: dict) -> dict:
        import json
        import socket

        with self._lock:
            if self._sock is None:
                self._sock = socket.create_connection(
                    (self._host, self._port), timeout=self._timeout)
                self._rfile = self._sock.makefile("rb")
            try:
                self._sock.sendall(
                    (json.dumps(req) + "\n").encode("utf-8"))
                line = self._rfile.readline()
            except OSError:
                self.close()
                raise
            if not line:
                self.close()
                raise ConnectionError("subscriber closed the connection")
            return json.loads(line.decode("utf-8"))

    def update_state(self, registration_id: str, deltas: dict) -> dict:
        return self._call({"op": "update_state",
                           "registration_id": registration_id,
                           "deltas": deltas})

    def heartbeat(self, registration_id: str) -> bool:
        return bool(self._call({"op": "heartbeat",
                                "registration_id": registration_id})
                    .get("ok"))

    def close(self) -> None:
        try:
            if self._sock is not None:
                self._sock.close()
        except OSError:
            pass
        self._sock = None
        self._rfile = None


# ---------------------------------------------------------------------------
# Serving-core glue: membership + catalog-update propagation
# ---------------------------------------------------------------------------

MEMBERSHIP_TOPIC = "impala-membership"   # TBackendDescriptor topic
CATALOG_TOPIC = "catalog-update"         # catalogd's topic


def attach_statestore(core, statestore: Statestore, *,
                      subscriber_id: str | None = None,
                      address: str = "") -> StatestoreSubscriber:
    """Wire an I2SServer core into the cluster control plane:

    * publishes this daemon's TBackendDescriptor-shaped membership entry on
      the TRANSIENT membership topic (failure -> automatic removal, how the
      reference cluster sheds dead impalads);
    * publishes the core's catalog DDL (data sources, functions, grants —
      the engine-level registries) on the catalog topic with this daemon's
      key prefix;
    * applies OTHER daemons' catalog entries to the core's local catalog
      log, which every NEW session replays (impalad local catalog cache).

    Returns the subscriber (tests drive statestore cycles directly)."""
    import json

    sid = subscriber_id or f"impalad-{uuid.uuid4().hex[:8]}"
    sub = StatestoreSubscriber(sid)

    def _on_membership(delta: dict) -> None:
        with core._lock:
            for item in delta["topic_entries"]:
                core.cluster_membership[item["key"]] = item["value"]
            for key in delta["topic_deletions"]:
                core.cluster_membership.pop(key, None)

    def _on_catalog(delta: dict) -> None:
        own = f"{sid}/"
        for item in delta["topic_entries"]:
            if item["key"].startswith(own):
                continue  # our own writes echo back; already applied
            stmt = json.loads(item["value"])["stmt"]
            core.apply_catalog_update(stmt, publish=False)

    sub.subscribe(MEMBERSHIP_TOPIC, _on_membership)
    sub.subscribe(CATALOG_TOPIC, _on_catalog)
    sub.register(statestore, [
        {"topic_name": MEMBERSHIP_TOPIC, "is_transient": True},
        {"topic_name": CATALOG_TOPIC, "is_transient": False},
    ])
    sub.publish(MEMBERSHIP_TOPIC,
                entries=[{"key": sid, "value": address or sid}])
    core.statestore_subscriber = sub
    core.statestore_subscriber_id = sid
    return sub
